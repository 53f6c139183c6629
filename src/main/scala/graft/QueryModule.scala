package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registrable unit of the engine's query surface.
  *
  * Every operator from SURVEY.md §2 (plus the LLM-pipeline extension
  * surface) is exposed as a named query over the driver's parquet star
  * schema, with a DuckDB-equivalent ANSI SQL oracle where the semantics
  * are SQL-expressible. `SparkEntry` concatenates all modules.
  */
trait QueryModule {
  /** name -> (spark, sfDir) => result. Results must be deterministic:
    * total ordering, exact integer aggregation, coarse rounding on libm. */
  def queries: Map[String, (SparkSession, String) => DataFrame]

  /** name -> equivalent DuckDB SQL over the same tables. Omitted entries
    * get the driver's weaker rows-only check (streaming / non-SQL ops). */
  def oracles: Map[String, String]
}
