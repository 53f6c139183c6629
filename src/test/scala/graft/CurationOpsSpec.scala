package graft

import org.apache.spark.sql.functions._

/** Structural invariants of the curation ops (CurationOps) that the
  * oracle-differential gate can't express. */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._
  private val d = "/root/testdata/sf0.001"

  test("chunk dedup: keeps are bounded, doc 0 keeps everything, text length matches") {
    val df = SparkEntry.queries("dd_chunk_dedup")(spark, d).persist()
    assert(df.where($"n_kept" > $"n_chunks").count() == 0)
    // doc_id 0 is the global min, so it owns every chunk it contains
    val d0 = df.where($"doc_id" === 0).collect().head
    assert(d0.getAs[Long]("n_kept") == d0.getAs[Long]("n_chunks"))
    // kept_text word count is between n_kept (all-short chunks) and
    // 3 * n_kept (all-full chunks); empty text for fully-dropped docs
    val bad = df.where(
      when($"n_kept" === 0, $"kept_text" =!= "")
        .otherwise(size(split($"kept_text", " ")) > $"n_kept" * 3 ||
                   size(split($"kept_text", " ")) < $"n_kept"))
    assert(bad.count() == 0)
    df.unpersist()
  }

  test("chunk dedup: every distinct chunk content survives in exactly one doc") {
    // cross-doc dedup: each distinct chunk content is owned by one doc
    // (its min doc_id). Within-doc repeats of an OWNED chunk are kept —
    // removing those is tx_repetition's domain, not boilerplate removal —
    // so total kept >= distinct contents, with equality iff no keeper doc
    // repeats a chunk internally.
    val df = SparkEntry.queries("dd_chunk_dedup")(spark, d)
    val keptTotal = df.agg(sum($"n_kept")).collect().head.getLong(0)
    val chunks = Tbl.documents(spark, d)
      .withColumn("words", split(graft.operators.TextNorm.norm($"text"), " "))
      .select(explode(expr(
        "transform(sequence(0, (size(words) - 1) div 3), " +
        "k -> concat_ws(' ', slice(words, k * 3 + 1, 3)))")).as("chunk"))
    val distinctContents = chunks.agg(countDistinct($"chunk"))
      .collect().head.getLong(0)
    assert(keptTotal >= distinctContents)
    // and the surplus is exactly the within-doc repeat count of the corpus
    // lower-bounded by zero: kept can never exceed total corpus chunks
    val totalChunks = chunks.count()
    assert(keptTotal <= totalChunks)
  }

  test("repetition: ppm fields bounded and exact on a known doc") {
    val df = SparkEntry.queries("tx_repetition")(spark, d)
    assert(df.where($"uniq_ppm" > 1000000 || $"top_bigram_ppm" > 1000000).count() == 0)
    assert(df.where($"uniq_ppm" <= 0 || $"top_bigram_ppm" <= 0).count() == 0)
    // hand-check: "a b a b a" -> words 5, distinct 2, bigrams [ab,ba,ab,ba],
    // top bigram 2 of 4
    val one = Seq((9L, "a b a b a")).toDF("doc_id", "text")
    val words = split(graft.operators.TextNorm.norm($"text"), " ")
    val row = one.select(size(words).as("nw"),
                         size(array_distinct(words)).as("nd")).collect().head
    assert(row.getInt(0) == 5 && row.getInt(1) == 2)
  }

  test("pii scrub: redacted text has no residual matches") {
    val aug = Seq((7L, "hello world")).toDF("doc_id", "text")
      .select(concat($"text", lit(" contact user"), $"doc_id".cast("string"),
                     lit("@mail.example.com or call 555-"),
                     lpad(($"doc_id" % 10000).cast("string"), 4, "0"),
                     lit(" now")).as("aug"))
    val scrubbed = aug.select(
      regexp_replace(regexp_replace($"aug", "[a-z0-9.]+@[a-z0-9.]+[a-z]", "<EMAIL>"),
                     "555-[0-9]{4}", "<PHONE>").as("s"))
    val r = scrubbed.collect().head.getString(0)
    assert(r.contains("<EMAIL>") && r.contains("<PHONE>"))
    assert(!r.contains("@mail") && !r.matches(".*555-[0-9]{4}.*"))
  }

  test("stratified sample: per-stratum rates land near target, deterministic") {
    val full = Tbl.events(spark, d).groupBy($"event_type")
      .agg(count(lit(1)).as("n_full"))
    val sampled = SparkEntry.queries("x_stratified_sample")(spark, d)
    val joined = sampled.join(full, "event_type")
      .select($"event_type", ($"n_sampled".cast("double") / $"n_full").as("frac"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // md5 is uniform; at sf0.001 (~1000 events, ~200/stratum) allow wide
    // tolerance around the 0.50/0.25/0.10 targets
    assert(math.abs(joined("click") - 0.50) < 0.15)
    assert(math.abs(joined("purchase") - 0.25) < 0.15)
    assert(joined.filterKeys(k => k != "click" && k != "purchase")
      .values.forall(f => math.abs(f - 0.10) < 0.12))
    // rerun selects the identical sample (no RNG anywhere)
    val again = SparkEntry.queries("x_stratified_sample")(spark, d)
    assert(sampled.exceptAll(again).count() == 0 &&
           again.exceptAll(sampled).count() == 0)
  }
}
