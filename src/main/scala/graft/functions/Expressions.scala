package graft.functions

import graft.core.RvlNumeric
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels referenced from generated code (Scala object methods get
  * static forwarders, so `graft.functions.ExprKernels.m(...)` is valid Java
  * inside whole-stage codegen). */
object ExprKernels {

  /** rvl finance-aware parse on a UTF8String; null = not numeric. */
  def rvlParse(s: UTF8String): java.lang.Double =
    RvlNumeric.parse(s.toString) match {
      case Some(d) => java.lang.Double.valueOf(d)
      case None => null
    }

  /** Sorted distinct shingle-hash set off UTF8String bytes (ASCII fast
    * path in TextHash.shingleSetUtf8); packed as an UnsafeArrayData so
    * codegen hands the shuffle a primitive long array. */
  def shingleSet(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(TextHash.shingleSetUtf8(s))

  /** Unicode NFC normalization (the canonical-composition pass CCNet runs
    * before hashing: 'e'+U+0301 and U+00E9 are the same text to a reader
    * but different bytes to md5). ASCII fast path: a pure-ASCII
    * UTF8String is definitionally NFC — return the SAME object, no
    * String round-trip (the overwhelmingly common case for web text
    * already transcoded upstream). Non-ASCII falls back to
    * java.text.Normalizer, whose NFC tables are the same Unicode
    * normalization DuckDB's utf8proc implements — the oracle-equality
    * contract the dedup query rides on. */
  def nfcNormalize(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) { if (s.getByte(i) < 0) ascii = false; i += 1 }
    if (ascii) s
    else {
      val str = s.toString
      if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
      else UTF8String.fromString(
        java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
    }
  }

  /** Exact set-Jaccard in permille over two SORTED DISTINCT long arrays,
    * computed straight off ArrayData (UnsafeArrayData.getLong) — the
    * native-Expression upgrade over the Scala UDF this replaces: the UDF
    * converter materialized every element of both arrays as a boxed
    * java.lang.Long per candidate pair (measured ~100 s CPU + ~50 s GC
    * across the verify stage at sf0.1's 98k pairs), while this kernel is
    * a zero-allocation linear merge. Bit-identical to
    * TextHash.sortedIntersect + the permille division. */
  def jaccardPermille(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0L
    while (i < na && j < nb) {
      val va = a.getLong(i)
      val vb = b.getLong(j)
      if (va == vb) { inter += 1; i += 1; j += 1 }
      else if (va < vb) i += 1
      else j += 1
    }
    val union = na.toLong + nb.toLong - inter
    if (union == 0L) 0L else inter * 1000L / union
  }

  /** LSH band keys (MinHashK/2 bands of 2 rows) over a shingle-hash set,
    * fused minhashFromSet+bandKeys off ArrayData — no boxed element
    * conversion on either side. Bit-identical to
    * TextHash.bandKeys(TextHash.minhashFromSet(_)). */
  def bandKeys(hs: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val k = TextHash.MinHashK
    val p = TextHash.P
    val aa = TextHash.A
    val bb = TextHash.B
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, p)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      val h0 = hs.getLong(i) % p
      var j = 0
      while (j < k) {
        val v = (aa(j) * h0 + bb(j)) % p
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    val nBands = k / 2
    val keys = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      keys(b) = out(2 * b) * p + out(2 * b + 1)
      b += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(keys)
  }

  /** ASCII trim (0x20/0x09 only) directly on UTF8String bytes — no String
    * round-trip. Leading/trailing space/tab bytes are standalone ASCII in
    * UTF-8, so byte-level trimming is multibyte-safe. */
  def asciiTrim(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var from = 0
    while (from < n && {
        val b = s.getByte(from); b == 0x20.toByte || b == 0x09.toByte
      }) from += 1
    var to = n
    while (to > from && {
        val b = s.getByte(to - 1); b == 0x20.toByte || b == 0x09.toByte
      }) to -= 1
    if (from == 0 && to == n) s
    else UTF8String.fromBytes(java.util.Arrays.copyOfRange(s.getBytes, from, to))
  }
}

/** Codegen'd rvl numeric parse (reference op 11, numeric/parse.rs) — the
  * native-Expression upgrade over a Scala UDF: no Option boxing, no
  * serialization, stays inside whole-stage codegen. */
case class RvlNumericParse(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string argument")

  override def nullSafeEval(v: Any): Any = {
    val r = ExprKernels.rvlParse(v.asInstanceOf[UTF8String])
    if (r == null) null else r.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val boxed = ctx.freshName("parsed")
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${childGen.isNull}) {
          java.lang.Double $boxed = graft.functions.ExprKernels.rvlParse(${childGen.value});
          if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.doubleValue(); }
        }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): RvlNumericParse =
    copy(child = newChild)
}

/** Codegen'd ASCII trim (reference op 8, normalize/trim.rs): byte-exact —
  * unlike Spark's `trim`, which strips more than 0x20/0x09. */
case class AsciiTrimExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string argument")

  override def nullSafeEval(v: Any): Any =
    ExprKernels.asciiTrim(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprKernels.asciiTrim($c)")

  override protected def withNewChildInternal(newChild: Expression): AsciiTrimExpr =
    copy(child = newChild)
}

/** Codegen'd Unicode NFC normalization (CCNet §3.1's pre-hash pass):
  * stays inside whole-stage codegen, ASCII rows never leave UTF8String. */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string argument")

  override def nullSafeEval(v: Any): Any =
    ExprKernels.nfcNormalize(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprKernels.nfcNormalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

/** Codegen'd shingle-set (dedup op): the per-doc distinct 8-gram hash set
  * computed straight off UTF8String bytes — the document text never
  * materializes as a java.lang.String on the ASCII path, and the result
  * is a primitive long array (UnsafeArrayData), so the whole
  * text→set→join dedup pipeline stays inside codegen'd rows. */
case class ShingleSetExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string argument")

  override def nullSafeEval(v: Any): Any =
    ExprKernels.shingleSet(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprKernels.shingleSet($c)")

  override protected def withNewChildInternal(newChild: Expression): ShingleSetExpr =
    copy(child = newChild)
}

/** Codegen'd exact set-Jaccard (permille) over two sorted distinct long
  * arrays — the per-pair verify kernel of the near-dup pipeline, kept
  * inside whole-stage codegen with zero per-element boxing (the Scala-UDF
  * predecessor's converter dominated the verify stage: see
  * ExprKernels.jaccardPermille). */
case class JaccardPermilleExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  // containsNull must be FALSE: the kernel reads getLong without null
  // checks, so a nullable-element array would produce garbage bits
  // silently — refuse at analysis instead (the shingle_set producer
  // emits non-null elements, so real pipelines always pass)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, false),
            org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, false)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint not null> arguments")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    ExprKernels.jaccardPermille(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ExprKernels.jaccardPermille($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardPermilleExpr =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd LSH band keys over a shingle-hash set (fused
  * minhash-from-set + band packing) — candidate generation without a
  * boxed array round-trip per document. */
case class BandKeysExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, false)
  // containsNull must be FALSE — same kernel null-safety contract as
  // JaccardPermilleExpr
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, false) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<bigint not null> argument")
    }

  override def nullSafeEval(v: Any): Any =
    ExprKernels.bandKeys(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprKernels.bandKeys($c)")

  override protected def withNewChildInternal(newChild: Expression): BandKeysExpr =
    copy(child = newChild)
}

/** Deployment-grade registration: inject the native expressions through
  * SparkSessionExtensions so `--conf spark.sql.extensions=
  * graft.functions.GraftExtensions` makes rvl_parse/ascii_trim available
  * in every session of a cluster without code changes. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    e.injectFunction((FunctionIdentifier("rvl_parse"),
      new ExpressionInfo(classOf[RvlNumericParse].getName, "rvl_parse"),
      (exprs: Seq[Expression]) => RvlNumericParse(exprs.head)))
    e.injectFunction((FunctionIdentifier("ascii_trim"),
      new ExpressionInfo(classOf[AsciiTrimExpr].getName, "ascii_trim"),
      (exprs: Seq[Expression]) => AsciiTrimExpr(exprs.head)))
    e.injectFunction((FunctionIdentifier("shingle_set"),
      new ExpressionInfo(classOf[ShingleSetExpr].getName, "shingle_set"),
      (exprs: Seq[Expression]) => ShingleSetExpr(exprs.head)))
    e.injectFunction((FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalizeExpr].getName, "nfc_normalize"),
      (exprs: Seq[Expression]) => NfcNormalizeExpr(exprs.head)))
    e.injectFunction((FunctionIdentifier("jaccard_permille"),
      new ExpressionInfo(classOf[JaccardPermilleExpr].getName, "jaccard_permille"),
      (exprs: Seq[Expression]) => JaccardPermilleExpr(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("band_keys"),
      new ExpressionInfo(classOf[BandKeysExpr].getName, "band_keys"),
      (exprs: Seq[Expression]) => BandKeysExpr(exprs.head)))
  }
}

/** Session registration + Column-facing helpers. */
object GraftFunctions {

  /** The registered SQL surface — `describe` advertises exactly this list
    * and ContractSpec binds the two (reference tests/golden_rules.rs). */
  val names: Seq[String] =
    Seq("rvl_parse", "ascii_trim", "shingle_set", "nfc_normalize",
      "jaccard_permille", "band_keys")

  private val builders: Map[String, Seq[Expression] => Expression] = Map(
    "rvl_parse" -> (exprs => RvlNumericParse(exprs.head)),
    "ascii_trim" -> (exprs => AsciiTrimExpr(exprs.head)),
    "shingle_set" -> (exprs => ShingleSetExpr(exprs.head)),
    "nfc_normalize" -> (exprs => NfcNormalizeExpr(exprs.head)),
    "jaccard_permille" -> (exprs => JaccardPermilleExpr(exprs(0), exprs(1))),
    "band_keys" -> (exprs => BandKeysExpr(exprs.head)))

  private val registered = java.util.Collections.synchronizedSet(
    new java.util.HashSet[String]())

  def ensureRegistered(spark: SparkSession): Unit = {
    if (registered.add(spark.sessionState.toString)) {
      for (n <- names)
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(
          n, builders(n), "built-in")
    }
  }

  def rvlParse(spark: SparkSession, c: Column): Column = {
    ensureRegistered(spark); call_function("rvl_parse", c)
  }

  def asciiTrim(spark: SparkSession, c: Column): Column = {
    ensureRegistered(spark); call_function("ascii_trim", c)
  }

  def shingleSet(spark: SparkSession, c: Column): Column = {
    ensureRegistered(spark); call_function("shingle_set", c)
  }

  def nfcNormalize(spark: SparkSession, c: Column): Column = {
    ensureRegistered(spark); call_function("nfc_normalize", c)
  }

  def jaccardPermille(spark: SparkSession, a: Column, b: Column): Column = {
    ensureRegistered(spark); call_function("jaccard_permille", a, b)
  }

  def bandKeys(spark: SparkSession, c: Column): Column = {
    ensureRegistered(spark); call_function("band_keys", c)
  }
}
