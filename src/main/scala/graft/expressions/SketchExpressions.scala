package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the dedup sketches.
  *
  * The composable `functions._` formulations (64 `transform`s over the
  * shingle array) are semantically fine but build enormous expression
  * trees: every permutation re-traverses the array and re-hashes every
  * shingle. These expressions compute the whole sketch in ONE pass per
  * row — one xxhash per shingle plus `numPerms` multiply-adds (universal
  * hashing), the standard MinHash construction — roughly numPerms× less
  * work and no giant codegen method.
  */
object Sketches {
  /** SplitMix64 — deterministic per-permutation multipliers/addends. */
  private[expressions] def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge.{toColumn, toExpr}

  def minhash(shingles: Column, numPerms: Int): Column =
    toColumn(MinHashSigExpr(toExpr(shingles), numPerms))

  def simhash(tokens: Column): Column =
    toColumn(SimHash64Expr(toExpr(tokens)))
}

/** Static per-row kernels, shared by interpreted eval and generated code
  * (a CodegenFallback would drag the whole child subtree — tokenizer,
  * shingler — into interpreted evaluation; calling these from doGenCode
  * keeps the full projection inside WholeStageCodegen).
  */
object SketchRuntime {
  def minhash(arr: ArrayData, mult: Array[Long], add: Array[Long]): ArrayData = {
    val numPerms = mult.length
    val mins = Array.fill(numPerms)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var p = 0
        while (p < numPerms) {
          val v = h * mult(p) + add(p)
          if (v < mins(p)) mins(p) = v
          p += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  def simhash(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** MinHash signature of a string-array column in a single pass.
  * h_p(x) = a_p * xxh64(x) + b_p with odd a_p (universal hashing);
  * output = per-permutation minimum as array<bigint>.
  */
case class MinHashSigExpr(child: Expression, numPerms: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  private lazy val mult: Array[Long] =
    Array.tabulate(numPerms)(p => Sketches.mix(2L * p) | 1L) // odd
  private lazy val add: Array[Long] =
    Array.tabulate(numPerms)(p => Sketches.mix(2L * p + 1L))

  override def nullSafeEval(input: Any): Any =
    SketchRuntime.minhash(input.asInstanceOf[ArrayData], mult, add)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val multRef = ctx.addReferenceObj("mult", mult, "long[]")
    val addRef = ctx.addReferenceObj("add", add, "long[]")
    // Call the object's static forwarder (plain class name, no MODULE$):
    // Janino cannot resolve the `SketchRuntime$` mangled class.
    val runtime = SketchRuntime.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $runtime.minhash($c, $multRef, $addRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

/** 64-bit SimHash of a string-array column in a single pass: per-bit
  * majority vote over the xxh64 of each token.
  */
case class SimHash64Expr(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(SketchRuntime.simhash(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val runtime = SketchRuntime.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $runtime.simhash($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}
