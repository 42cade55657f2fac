package graft.sources

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.catalyst.expressions.{
  Attribute, AttributeReference, EqualTo, Expression, In, Literal, XxHash64}
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.util.sketch.BloomFilter

/** Per-file bloom-filter data skipping — the file-pruning complement to
  * min/max range stats for NON-clustered keys (Databricks' bloom filter
  * index capability on Delta tables, re-expressed manifest-first).
  *
  * Range stats prune beautifully after range-clustered writes; but a
  * table whose key arrives scattered (uuid-keyed CDC, hash-distributed
  * ids, post-append interleavings) has every file spanning nearly the
  * whole key domain — min/max prunes nothing, and a 1k-row point batch
  * MERGE reads every file of a 100 TB table. A small per-file bloom over
  * the key column answers "can this file possibly hold key k?" in O(1)
  * regardless of how the values interleave; false positives only ever
  * KEEP a file (soundness is structural).
  *
  * Representation: one sidecar per data file under `_graft/bloom/`,
  * holding a [[BloomFilter]] (Spark's own sketch — the exact format and
  * XxHash64 pre-hash Spark's runtime bloom join filters use, so write
  * and probe can never disagree on hashing) per indexed column. The
  * manifest entry carries only the sidecar's rel path; sidecars are
  * immutable and ride through commits exactly like data files (a kept
  * file keeps its sidecar ref; a rewrite gets fresh ones).
  *
  * Probe side: equality/IN literals are extracted from pushed-down data
  * filters (already coerced by the analyzer, so literal and column
  * types agree), hashed once, then tested per candidate file. Only
  * files that SURVIVED range pruning are probed, and sidecars load
  * through a bounded LRU, so planning stays O(candidates), not O(table
  * history). Deletion vectors never touch blooms: a mask only removes
  * rows, so the bloom stays a sound over-approximation.
  */
object BloomSkipping {

  private val Magic = 0x47424c4d // "GBLM"

  /** Serialize col -> bloom as one sidecar payload. */
  private[graft] def encode(blooms: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(Magic)
    out.writeInt(blooms.size)
    blooms.foreach { case (c, b) =>
      out.writeUTF(c); out.writeInt(b.length); out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  private[graft] def decode(bytes: Array[Byte]): Map[String, BloomFilter] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    require(in.readInt() == Magic, "not a graft bloom sidecar")
    (0 until in.readInt()).map { _ =>
      val c = in.readUTF()
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      c -> BloomFilter.readFrom(b)
    }.toMap
  }

  /** Bounded loader cache: sidecars are immutable, so entries never
    * invalidate; the bound caps driver memory (sidecars are ~0.1-1 MB).
    */
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, Map[String, BloomFilter]](
      64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Map[String, BloomFilter]]): Boolean =
        size() > 64
    })

  private[graft] def load(root: String, rel: String): Map[String, BloomFilter] = {
    val key = s"$root/$rel"
    val hit = cache.get(key)
    if (hit != null) return hit
    val loaded =
      try decode(Files.readAllBytes(Paths.get(root, rel)))
      catch { case _: java.io.IOException => Map.empty[String, BloomFilter] }
    cache.put(key, loaded)
    loaded
  }

  /** The exact hash the write-side aggregate applied: XxHash64 of the
    * TYPED value (Spark's bloom runtime-filter convention). Evaluated
    * driver-side through the same expression class, so write and probe
    * can never diverge. `hashOf` takes an EXTERNAL (collected) value —
    * `Literal.create` converts it to the internal form; a literal from
    * an analyzed filter is already internal, so [[hashOfLiteral]] hashes
    * it as-is.
    */
  private[graft] def hashOf(value: Any, dt: DataType): Long =
    hashOfLiteral(Literal.create(value, dt))

  private[graft] def hashOfLiteral(l: Literal): Long =
    new XxHash64(Seq(l)).eval(null).asInstanceOf[Long]

  /** Per-column candidate hash sets from pushed-down (analyzed) filters:
    * `c = lit` and `c IN (lits)` shapes only, and only when the literal
    * type matches the column's (post-analysis filters always do; the
    * guard keeps unanalyzed callers sound). A column may appear in
    * several conjuncts — sets intersect by keeping the TIGHTEST (fewest
    * hashes) constraint, which is sufficient for pruning.
    */
  private[graft] def equalityHashes(
      filters: Seq[Expression], schema: StructType): Map[String, Seq[Long]] = {
    def attr(e: Expression): Option[(String, DataType)] = e match {
      case a: Attribute if schema.fieldNames.contains(a.name) =>
        Some(a.name -> schema(a.name).dataType)
      case a: AttributeReference if schema.fieldNames.contains(a.name) =>
        Some(a.name -> schema(a.name).dataType)
      case _ => None
    }
    def lits(c: DataType, es: Seq[Expression]): Option[Seq[Long]] = {
      val vs = es.collect { case l: Literal if l.dataType == c && l.value != null => l }
      if (vs.length == es.length && vs.nonEmpty)
        Some(vs.map(hashOfLiteral)) else None
    }
    val acc = scala.collection.mutable.Map[String, Seq[Long]]()
    def add(c: String, hs: Seq[Long]): Unit =
      acc(c) = acc.get(c).filter(_.length <= hs.length).getOrElse(hs)
    filters.foreach {
      case EqualTo(e, l: Literal) =>
        for ((c, dt) <- attr(e); hs <- lits(dt, Seq(l))) add(c, hs)
      case EqualTo(l: Literal, e) =>
        for ((c, dt) <- attr(e); hs <- lits(dt, Seq(l))) add(c, hs)
      case In(e, vs) if vs.nonEmpty =>
        for ((c, dt) <- attr(e); hs <- lits(dt, vs)) add(c, hs)
      case _ => ()
    }
    acc.toMap
  }

  /** May `f` hold any of the constrained values? A file without a
    * sidecar, or whose sidecar lacks a constrained column, always
    * survives — blooms only ever sharpen, never widen, the range
    * verdict. With several constrained columns the row must satisfy ALL
    * of them, so a miss on ANY bloom-indexed column prunes the file.
    */
  private[graft] def fileMayMatch(
      root: String, f: ManifestFile, hashes: Map[String, Seq[Long]]): Boolean = {
    if (hashes.isEmpty || f.bloom.isEmpty) return true
    val blooms = load(root, f.bloom.get)
    hashes.forall { case (c, hs) =>
      blooms.get(c).forall(b => hs.exists(b.mightContainLong))
    }
  }

  /** Sidecar file location for a fresh data file. */
  private[graft] def sidecarRel(): String =
    s"_graft/bloom/${java.util.UUID.randomUUID().toString.take(12)}.bin"

  private[graft] def write(root: String, rel: String, payload: Array[Byte]): Unit = {
    val p: Path = Paths.get(root, rel)
    Files.createDirectories(p.getParent)
    val tmp = Files.createTempFile(p.getParent, ".bloom", ".tmp")
    Files.write(tmp, payload)
    Files.move(tmp, p, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }
}
