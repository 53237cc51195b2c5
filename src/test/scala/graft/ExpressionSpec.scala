package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native Catalyst expressions: semantics match the pure kernels, and the
  * plan stays inside WholeStageCodegen (the point of not using a UDF). */
class ExpressionSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  test("rvl_parse matches RvlNumeric.parse on the reference vectors") {
    val vectors = Seq("123", "-123.45", "1e6", "$1,234.56", "($-1,234.56)",
      "  123  ", "\t$1,234.00\t", "12,34", "NaN", "inf", "", "sep=,", "+$-1", "1,234.5.6")
    val df = vectors.toDF("raw")
      .select($"raw", GraftFunctions.rvlParse(spark, $"raw").as("parsed"))
    val got = df.collect().map(r =>
      r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    for (v <- vectors)
      assert(got(v) === graft.core.RvlNumeric.parse(v), s"vector '$v'")
  }

  test("ascii_trim matches AsciiTrim.trim byte-for-byte incl. unicode") {
    val vectors = Seq("  hello  ", "\thello\t", " \t x \t ", "", "  \t ",
      "\r\nhello\r\n", " nbsp ", "café ", "u8:x\t")
    val df = vectors.toDF("raw")
      .select($"raw", GraftFunctions.asciiTrim(spark, $"raw").as("trimmed"))
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    for (v <- vectors)
      assert(got(v) === graft.core.AsciiTrim.trim(v), s"vector '${v.replace("\t", "\\t")}'")
  }

  test("expressions run inside WholeStageCodegen (no UDF boundary)") {
    GraftFunctions.ensureRegistered(spark)
    val df = spark.range(100).select(
      call_function("rvl_parse", concat(lit("$"), $"id".cast("string"))).as("p"),
      call_function("ascii_trim", concat(lit(" "), $"id".cast("string"), lit("\t"))).as("t"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" marks a WholeStageCodegen stage in the abbreviated plan string
    assert(plan.contains("*(1) Project"), plan)
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
    // and the values are right through the codegen path
    val rows = df.collect()
    assert(rows(42).getDouble(0) === 42.0)
    assert(rows(42).getString(1) === "42")
  }

  test("shingle_set: byte path == String path, ASCII and multibyte") {
    import graft.functions.TextHash
    import org.apache.spark.unsafe.types.UTF8String
    val ascii = "the quick brown fox jumps over the lazy dog, twice over"
    assert(TextHash.shingleSetUtf8(UTF8String.fromString(ascii)).toSeq ===
      TextHash.shingleSet(ascii).toSeq)
    // multibyte content forces the String fallback — still identical
    val uni = "naïve café prose with enough length for shingles — ünïcode"
    assert(TextHash.shingleSetUtf8(UTF8String.fromString(uni)).toSeq ===
      TextHash.shingleSet(uni).toSeq)
    // short doc: empty set
    assert(TextHash.shingleSetUtf8(UTF8String.fromString("tiny")).isEmpty)
    // and the SQL-registered expression matches a scala-side recompute
    GraftFunctions.ensureRegistered(spark)
    Seq(ascii).toDF("s").createOrReplaceTempView("t_shingle_spec")
    val got = spark.sql("SELECT shingle_set(s) FROM t_shingle_spec")
      .collect()(0).getSeq[Long](0)
    assert(got === TextHash.shingleSet(ascii).toSeq)
  }

  test("nfc_normalize: NFC semantics, ASCII same-object fast path, codegen") {
    import org.apache.spark.unsafe.types.UTF8String
    // kernel semantics: decomposed composes, precomposed unchanged,
    // pure-ASCII returns the SAME UTF8String object (no copy)
    val decStr = "cafe\u0301 menu"; val preStr = "caf\u00e9 menu"
    assert(decStr != preStr, "fixture must be byte-distinct")
    val dec = UTF8String.fromString("café")
    val pre = UTF8String.fromString("café")
    assert(graft.functions.ExprKernels.nfcNormalize(dec) === pre)
    assert(graft.functions.ExprKernels.nfcNormalize(pre) === pre)
    val ascii = UTF8String.fromString("plain ascii text")
    assert(graft.functions.ExprKernels.nfcNormalize(ascii) eq ascii)
    // column path through codegen: NFC digests agree where raw differ
    // via an RDD scan: a literal LocalRelation is constant-folded away
    // and the plan assertion below would see no Project at all
    val df = spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(decStr, preStr, "ascii only"))
          .map(org.apache.spark.sql.Row(_)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("raw",
            org.apache.spark.sql.types.StringType))))
      .select($"raw",
        md5(GraftFunctions.nfcNormalize(spark, $"raw")).as("nfc_digest"),
        md5($"raw").as("raw_digest"))
    val rows = df.collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2)))
    val byRaw = rows.map(r => r._1 -> r).toMap
    assert(byRaw(decStr)._2 === byRaw(preStr)._2,
      "NFC digests must unify the decomposed/precomposed pair")
    assert(byRaw(decStr)._3 !== byRaw(preStr)._3,
      "raw digests must differ or the fixture is vacuous")
    assert(byRaw("ascii only")._2 === byRaw("ascii only")._3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }

  test("jaccard_permille / band_keys match the TextHash kernels and stay codegen") {
    import graft.functions.TextHash
    GraftFunctions.ensureRegistered(spark)
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "the quick brown fox jumps over the lazy dog again and again tail",
      "completely different content with no overlap whatsoever here",
      "tiny", "")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select($"id", $"text", GraftFunctions.shingleSet(spark, $"text").as("hset"))
    val pairs = df.as("a").crossJoin(df.as("b"))
      .filter($"a.id" < $"b.id")
      .select($"a.id".as("ia"), $"b.id".as("ib"), $"a.text".as("ta"), $"b.text".as("tb"),
        GraftFunctions.jaccardPermille(spark, $"a.hset", $"b.hset").as("jac"))
    for (r <- pairs.collect()) {
      val sa = TextHash.shingleSet(r.getString(2))
      val sb = TextHash.shingleSet(r.getString(3))
      val inter = TextHash.sortedIntersect(sa, sb)
      val union = sa.length.toLong + sb.length.toLong - inter
      val expect = if (union == 0) 0L else inter * 1000L / union
      assert(r.getLong(4) === expect, s"pair (${r.getLong(0)}, ${r.getLong(1)})")
    }
    val bands = df.select($"text",
      GraftFunctions.bandKeys(spark, $"hset").as("bk")).collect()
    for (r <- bands) {
      val expect = TextHash.bandKeys(TextHash.minhash(r.getString(0))).toSeq
      assert(r.getSeq[Long](1) === expect, s"text '${r.getString(0).take(20)}'")
    }
    // both expressions must stay inside whole-stage codegen — no UDF node
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"), plan)
  }

  test("rvl_parse is usable from SQL text") {
    GraftFunctions.ensureRegistered(spark)
    Seq("(1,234.5)").toDF("s").createOrReplaceTempView("t_expr_spec")
    val v = spark.sql("SELECT rvl_parse(s) FROM t_expr_spec").collect()(0).getDouble(0)
    assert(v === -1234.5)
  }

  test("GraftExtensions wiring applies to a fresh SparkSessionExtensions") {
    // the config-injection path needs a fresh JVM (getOrCreate would reuse
    // the suite session); it is verified end-to-end via spark-sql:
    //   spark-sql --conf spark.sql.extensions=graft.functions.GraftExtensions \
    //     --jars rvlspark.jar -e "SELECT rvl_parse('($1,234.50)')"  => -1234.5
    // here we assert the injector registers both builders without error
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
    // and that the builders construct working expressions
    import org.apache.spark.sql.catalyst.expressions.Literal
    val parse = graft.functions.RvlNumericParse(Literal("($1,234.50)"))
    assert(parse.eval(null) === -1234.5)
    val trim = graft.functions.AsciiTrimExpr(Literal("  x\t"))
    assert(trim.eval(null).toString === "x")
  }
}
