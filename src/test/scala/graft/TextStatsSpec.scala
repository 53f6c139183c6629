package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{CharClassCounts, NormText, TokenGroupCounts}

/** The native text kernels must be bit-identical to the regex/HOF
  * formulations they replaced — TextNorm.norm is the canonical
  * normalization under every dedup/text oracle, so any divergence here
  * is an oracle break waiting for a corpus that exercises it. The
  * fixtures deliberately include the Unicode lowercase edge cases the
  * kernel must inherit from UTF8String.toLowerCase rather than
  * reimplement: İ (U+0130 → i + combining dot, the dot then stripped),
  * K (Kelvin → k, KEPT by the class), ß, Σ, supplementary-plane chars,
  * combining marks, tabs/newlines (stripped, never collapsed to a
  * space), and space runs at every position. */
class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  private val regexNorm =
    trim(regexp_replace(regexp_replace(lower($"s"), "[^a-z0-9 ]", ""), " +", " "))

  private val palette: Array[String] = Array(
    "a", "z", "Q", "M", "0", "9", " ", "  ", "   ", ".", ",", "!", "|",
    "\t", "\n", "\r", "İ", "K", "ß", "Σ", "é", "漢", "👾", "é",
    "̇", "the", "THE", "a1b2", "---", " the ", "und", "la")

  private def randomStrings(seed: Int, n: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val k = rnd.nextInt(12)
      (i.toLong, (0 until k).map(_ => palette(rnd.nextInt(palette.length))).mkString)
    }.toDF("id", "s")
  }

  test("NormText ≡ trim(regexp_replace(regexp_replace(lower(s), '[^a-z0-9 ]', ''), ' +', ' ')) on adversarial strings") {
    val df = randomStrings(17, 4000)
      .withColumn("native", NormText.of($"s"))
      .withColumn("rx", regexNorm)
    val bad = df.where(not($"native" <=> $"rx"))
    assert(bad.count() == 0, bad.limit(5).collect().mkString("\n"))
    // non-degenerate: empties, unicode-bearing, and multi-space inputs all present
    assert(df.where(length($"s") === 0).count() > 0)
    assert(df.where($"s".contains("İ") || $"s".contains("K")).count() > 0)
    assert(df.where($"s".contains("  ")).count() > 0)
  }

  test("NormText null-propagates like the regex form") {
    val df = Seq((1L, null: String), (2L, "A b!")).toDF("id", "s")
      .withColumn("native", NormText.of($"s"))
      .withColumn("rx", regexNorm)
    assert(df.where(not($"native" <=> $"rx")).count() == 0)
    assert(df.where($"id" === 1L && $"native".isNull).count() == 1)
  }

  test("TokenGroupCounts ≡ size(filter(split(ntext,' '), In)) per group, plus size(split) and non-space length") {
    val stop = Seq("the", "a", "und", "la")
    val groups = Seq("the" -> 0, "a" -> 0, "und" -> 1, "la" -> 1)
    val df = randomStrings(23, 4000)
      .withColumn("nt", NormText.of($"s"))
      .withColumn("st", TokenGroupCounts.of($"nt", groups, 2))
      .withColumn("words", split($"nt", " "))
    def hofCount(ws: Seq[String]) =
      size(filter($"words", w => w.isInCollection(ws))).cast("long")
    val bad = df.where(
      not(element_at($"st", 1) <=> hofCount(Seq("the", "a"))) ||
      not(element_at($"st", 2) <=> hofCount(Seq("und", "la"))) ||
      not(element_at($"st", 3) <=> size($"words").cast("long")) ||
      not(element_at($"st", 4) <=>
        length(regexp_replace($"nt", " ", "")).cast("long")))
    assert(bad.count() == 0, bad.limit(5).collect().mkString("\n"))
    // adjacent repeats ("the the the") must each count
    val rep = Seq((1L, "the the the a a")).toDF("id", "s")
      .select(TokenGroupCounts.of(NormText.of($"s"), groups, 2).as("st"))
      .select(element_at($"st", 1)).as[Long].head()
    assert(rep == 5L)
    assert(stop.forall(w => groups.map(_._1).contains(w)))
  }

  test("RegexishTokenCount ≡ size(regexp_extract_all(s, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) on adversarial strings") {
    val df = randomStrings(41, 4000)
      .withColumn("native", org.apache.spark.sql.graft.RegexishTokenCount.of($"s"))
      .withColumn("rx", size(regexp_extract_all($"s",
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0))).cast("long"))
    val bad = df.where(not($"native" <=> $"rx"))
    assert(bad.count() == 0, bad.limit(5).collect().mkString("\n"))
    // mixed-run fixtures: letter/digit boundaries and unicode singles
    val edge = Seq((1L, "ab12cd 34!!x漢字9"), (2L, ""), (3L, "   "), (4L, "a1a1a1"))
      .toDF("id", "s")
      .withColumn("native", org.apache.spark.sql.graft.RegexishTokenCount.of($"s"))
      .withColumn("rx", size(regexp_extract_all($"s",
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0))).cast("long"))
    assert(edge.where(not($"native" <=> $"rx")).count() == 0)
  }

  test("CharClassCounts ≡ the regex length-delta counts on raw text") {
    val df = randomStrings(31, 4000)
      .withColumn("cc", CharClassCounts.of($"s"))
    val punct = (length($"s") -
      length(regexp_replace($"s", "[^A-Za-z0-9 ]", ""))).cast("long")
    val digit = (length($"s") -
      length(regexp_replace($"s", "[0-9]", ""))).cast("long")
    val bad = df.where(
      not(element_at($"cc", 1) <=> punct) || not(element_at($"cc", 2) <=> digit))
    assert(bad.count() == 0, bad.limit(5).collect().mkString("\n"))
  }

  test("TokenArrayStats ≡ the x_array_ops HOF pipeline on adversarial strings") {
    // extra rows force the branches the random palette can't reach:
    // a ≥30-char token (all_short=false), a long pure-digit token
    // (has_num), repeated word pairs (bigram dedup), and empty text
    val extra = Seq(
      (100001L, "x".repeat(35) + " ok"), (100002L, "123456789012345"),
      (100003L, "a b a b a b"), (100004L, ""), (100005L, "solo"))
      .toDF("id", "s")
    val df = randomStrings(41, 4000).unionAll(extra)
      .withColumn("nt", NormText.of($"s"))
      .withColumn("st", org.apache.spark.sql.graft.TokenArrayStats.of($"nt"))
      .withColumn("words", split($"nt", " "))
      .withColumn("bigrams",
        zip_with(slice($"words", lit(1), size($"words") - 1),
                 slice($"words", lit(2), size($"words") - 1),
                 (a, b) => concat_ws("_", a, b)))
    val bad = df.where(
      not(element_at($"st", 1) <=> size($"words").cast("long")) ||
      not(element_at($"st", 2) <=>
        aggregate($"words", lit(0L), (acc, w) => acc + length(w))) ||
      not(element_at($"st", 3) <=>
        size(filter($"words", w => length(w) > 7)).cast("long")) ||
      not((element_at($"st", 4) === 1L) <=>
        exists($"words", w => w.rlike("^[0-9]+$"))) ||
      not((element_at($"st", 5) === 1L) <=>
        forall($"words", w => length(w) < 30)) ||
      not(element_at($"st", 6) <=>
        size(array_distinct($"bigrams")).cast("long")))
    assert(bad.count() == 0, bad.limit(5).collect().mkString("\n"))
    // the forced branches really fired
    val st = df.where($"id" >= 100001L).orderBy($"id")
      .select($"st").collect().map(_.getSeq[Long](0))
    assert(st(0)(4) == 0L, "35-char token must break all_short")
    assert(st(1)(3) == 1L, "digit token must set has_num")
    assert(st(2)(5) == 2L, "repeated pairs must dedup to 2 bigrams")
    assert(st(3)(0) == 1L && st(3)(5) == 0L, "empty text → 1 empty token, 0 bigrams")
  }

  test("whole-corpus differential: x_array_ops_kernel ≡ x_array_ops on every sf0.01 document") {
    val d = "/root/testdata/sf0.01"
    val hof = SparkEntry.queries("x_array_ops")(spark, d)
    val ker = SparkEntry.queries("x_array_ops_kernel")(spark, d)
    assert(hof.schema == ker.schema)
    assert(hof.exceptAll(ker).isEmpty && ker.exceptAll(hof).isEmpty)
  }

  test("whole-corpus differential: kernel norm ≡ regex norm on every sf0.01 document") {
    val docs = Tbl.documents(spark, "/root/testdata/sf0.01")
      .withColumn("s", $"text")
    val bad = docs
      .withColumn("native", NormText.of($"s"))
      .withColumn("rx", regexNorm)
      .where(not($"native" <=> $"rx"))
    assert(bad.count() == 0, bad.select("doc_id").limit(5).collect().mkString(","))
  }
}
