package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** LLM-training-data pipeline operators (dedup, similarity search, text
  * analysis, multimodal) — populated incrementally; see graft.operators.
  */
object PipelineQueries {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracle: Map[String, String] = Map()
}
