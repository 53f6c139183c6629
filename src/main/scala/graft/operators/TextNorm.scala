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
    * collapsed — the canonical form for fingerprints/shingles. */
  def norm(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", ""), " +", " "))
  val normSql: String =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"

  /** Distinct word 3-shingles, staged through a `words` attribute: the
    * split/regex normalization must be a materialized column BEFORE the
    * shingle lambda touches it — `element_at(<split-expr>, i)` inside a
    * higher-order function re-evaluates the split per element (HOFs run
    * interpreted, outside codegen CSE), which measured 8× slower at
    * sf0.1. CollapseProject keeps the boundary because `words` is
    * referenced many times and isn't cheap. */
  def withShingles(df: DataFrame): DataFrame = {
    val w = col("words")
    val sh = when(size(w) >= 3,
      array_distinct(transform(sequence(lit(1), size(w) - 2),
        i => concat_ws(" ",
          element_at(w, i), element_at(w, i + 1), element_at(w, i + 2)))))
      .otherwise(array(concat_ws(" ", w)))
    df.withColumn("words", split(norm(col("text")), " "))
      .withColumn("sh", sh)
  }
  val shinglesSql: String = {
    val words = s"string_split($normSql, ' ')"
    s"""CASE WHEN len($words) >= 3 THEN
       |  list_distinct([$words[i] || ' ' || $words[i+1] || ' ' || $words[i+2]
       |                 for i in generate_series(1, len($words) - 2)])
       |ELSE [$normSql] END""".stripMargin
  }
}
