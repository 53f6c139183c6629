package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Canonical text normalization + word-3-shingle construction, shared by
  * the dedup family (MinHash/LSH, n-gram Jaccard) and the fingerprinting
  * ops — one definition so shingles and fingerprints can never silently
  * disagree, with the DuckDB mirror kept beside the Spark form.
  */
object TextNorm {

  /** Normalized text: lowercase, punctuation stripped, whitespace
    * collapsed — the canonical form for fingerprints/shingles. The
    * kernel form of `trim(regexp_replace(regexp_replace(lower(c),
    * "[^a-z0-9 ]", ""), " +", " "))` — bit-identical (TextStatsSpec
    * pins a randomized + whole-corpus differential; `normSql` below
    * still states the regex arithmetic for every DuckDB oracle). The
    * regex form is the single hottest expression in the text/dedup
    * family (one scan per corpus in ~20 queries), and java.util.regex
    * char-class scans measured 40× slower than a byte loop AND
    * anti-scaling under concurrency on this host (see TextStats.scala
    * header; measured sf100p walls in SURVEY §14). */
  def norm(c: Column): Column = org.apache.spark.sql.graft.NormText.of(c)
  val normSql: String =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"

  /** Distinct word 3-shingles, staged through a `words` attribute: the
    * split/regex normalization must be a materialized column BEFORE the
    * shingle construction touches it (the original HOF form re-evaluated
    * the split per element, measured 8× slower at sf0.1; the lesson
    * stands for every HOF in the codebase). The construction itself is
    * the native [[org.apache.spark.sql.graft.Shingles3]] kernel — the
    * `array_distinct(transform(...concat_ws...))` HOF ran interpreted
    * per window; the kernel emits identical bytes in one loop per row
    * and keeps the projection inside whole-stage codegen
    * (TextDigestsSpec pins bit-equality with the HOF form, which the
    * DuckDB `shinglesSql` mirror still states). */
  def withShingles(df: DataFrame): DataFrame =
    df.withColumn("words", split(norm(col("text")), " "))
      // coalesce: a NULL text row yields NULL words, and the former HOF
      // formulation produced a single empty shingle for it (concat_ws
      // never returns null) while the null-propagating kernel would drop
      // the row — pin the old behavior at the boundary so the two can
      // never diverge on a null-bearing corpus
      .withColumn("sh", org.apache.spark.sql.graft.Shingles3.of(
        coalesce(col("words"), array(lit("")))))
  val shinglesSql: String = {
    val words = s"string_split($normSql, ' ')"
    s"""CASE WHEN len($words) >= 3 THEN
       |  list_distinct([$words[i] || ' ' || $words[i+1] || ' ' || $words[i+2]
       |                 for i in generate_series(1, len($words) - 2)])
       |ELSE [$normSql] END""".stripMargin
  }
}
