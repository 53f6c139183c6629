package graft.operators

import graft.{QueryModule, Tbl}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate string join (record linkage) — matching entity names that
  * differ by a typo is the classic master-data operation a 100 TB
  * ingest pipeline runs against every new snapshot, and the naive form
  * is an O(n²) levenshtein scan that no cluster survives.
  *
  * Blocking is the FastSS deletion neighborhood (Bocek et al., "Fast
  * Similarity Search in Large Dictionaries", 2007): for edit distance
  * ≤ 1, two strings match only if their {identity ∪ single-deletion}
  * variant sets intersect — substitutions share the deletion at the
  * substituted position, insertions/deletions share identity-vs-variant.
  * That turns the fuzzy join into
  *
  *   explode(L+1 variants) → hash EQUI-join on the variant → distinct
  *   candidate pair → levenshtein verify
  *
  * a linear key expansion (L+1 ≈ 19 here, never data-dependent) and one
  * shuffle on the variant string — the same block→equi-join→refine
  * discipline as the MinHash/LSH and spatial-grid families, and EXACT:
  * the neighborhood is a complete candidate generator for ed ≤ 1, and
  * the verify step keeps no false positives. Higher thresholds
  * generalize by deleting k characters (neighborhood L^k/k!), same
  * shape. The verify predicate is `levenshtein` — identical integer DP
  * on both engines, so the oracle matches exactly.
  *
  * Input: customer names plus one deterministic "typo twin" per row
  * (the character at position custkey mod length is dropped), so the
  * join must find planted deletion pairs AND the incidental
  * single-digit-substitution pairs the zero-padded names contain.
  */
object FuzzyJoinOps extends QueryModule {

  /** Mutant ids live far above every real custkey. */
  private val MutantOffset = 1000000000L

  /** Originals ∪ deterministic deletion mutants, (id, name). */
  private def names(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cust = Tbl.customer(s, d)
    cust.select($"c_custkey".as("id"), $"c_name".as("name"))
      .unionAll(cust.select(
        ($"c_custkey" + MutantOffset).as("id"),
        expr("concat(" +
             "substring(c_name, 1, cast(c_custkey % length(c_name) as int)), " +
             "substring(c_name, cast(c_custkey % length(c_name) as int) + 2, 1000))"
        ).as("name")))
  }

  /** Core ed≤1 pair join, shared with the spec (which feeds planted
    * strings through the same shape). `rel` must carry (id, name).
    *
    * What shuffles is the POINT of this shape, so it is kept minimal:
    * the exploded relation joins on `xxhash64(variant)` carrying only
    * the id — two longs per row instead of (id, full name, variant
    * string), and the candidate distinct dedups (id, id) pairs, not
    * string tuples (the zero-padded corpus makes candidate multiplicity
    * real: ~15 co-variant rows per hot key). A hash collision can only
    * ADD a candidate pair, which the exact levenshtein refine removes;
    * equal variants always hash equal, so no pair is lost. Names
    * re-attach AFTER the distinct by id join — the base relation is
    * orders of magnitude smaller than the exploded/joined stream (and
    * broadcast-sized here). */
  private[graft] def editDistancePairs(rel: DataFrame): DataFrame = {
    val s = rel.sparkSession
    import s.implicits._
    // {identity ∪ single deletions}, deduped ("aab" deletes to "ab"
    // two ways); sequence(0, L)'s i = L term IS the identity string
    val keyed = rel.select($"id", explode(expr(
        "array_distinct(transform(sequence(0, length(name)), " +
        "i -> concat(substring(name, 1, i), substring(name, i + 2, 1000))))")).as("k"))
      .select($"id", xxhash64($"k").as("kh"))
    val candidates = keyed.select($"id".as("id_a"), $"kh")
      .join(keyed.select($"id".as("id_b"), $"kh"), "kh")
      .where($"id_a" < $"id_b")
      // distinct BEFORE the verify: identical strings share all L+1
      // variants, so the same pair arrives up to L+1 times
      .select($"id_a", $"id_b").distinct()
    candidates
      .join(rel.select($"id".as("id_a"), $"name".as("name_a")), "id_a")
      .join(rel.select($"id".as("id_b"), $"name".as("name_b")), "id_b")
      .withColumn("ed", levenshtein($"name_a", $"name_b"))
      .where($"ed" <= 1)
      .select($"id_a", $"id_b", $"ed")
  }

  private def fuzzyJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    editDistancePairs(names(s, d)).orderBy($"id_a", $"id_b")
  }

  private val fuzzyJoinSql =
    s"""WITH names AS (
       |  SELECT c_custkey AS id, c_name AS name FROM customer
       |  UNION ALL
       |  SELECT c_custkey + $MutantOffset AS id,
       |         substr(c_name, 1, CAST(c_custkey % length(c_name) AS INT))
       |           || substr(c_name, CAST(c_custkey % length(c_name) AS INT) + 2, 1000) AS name
       |  FROM customer),
       |keys AS (
       |  SELECT id, name,
       |         unnest(list_distinct(list_transform(range(0, length(name) + 1),
       |           i -> substr(name, 1, CAST(i AS INT))
       |                  || substr(name, CAST(i AS INT) + 2, 1000)))) AS k
       |  FROM names),
       |cand AS (
       |  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
       |         a.name AS name_a, b.name AS name_b
       |  FROM keys a JOIN keys b ON a.k = b.k AND a.id < b.id)
       |SELECT id_a, id_b, levenshtein(name_a, name_b) AS ed
       |FROM cand WHERE levenshtein(name_a, name_b) <= 1
       |ORDER BY id_a, id_b""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j8_fuzzy_join" -> (fuzzyJoin _))

  override def oracles: Map[String, String] = Map(
    "j8_fuzzy_join" -> fuzzyJoinSql)
}
