package graft

import graft.operators.FuzzyJoinOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** FastSS edit-distance join (`j8_fuzzy_join`): the deletion-neighborhood
  * blocking must be a COMPLETE candidate generator for ed ≤ 1 — every
  * substitution / insertion / deletion / identity pair found, every
  * ed ≥ 2 pair refined away, each pair exactly once. */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def rel(rows: (Long, String)*): DataFrame = rows.toDF("id", "name")

  private def pairs(df: DataFrame): Set[(Long, Long, Int)] =
    FuzzyJoinOps.editDistancePairs(df)
      .select($"id_a", $"id_b", $"ed".cast("int")).as[(Long, Long, Int)]
      .collect().toSet

  test("each ed<=1 edit class pairs; ed=2 does not; identity pairs once") {
    val found = pairs(rel(
      1L -> "kestrel",
      2L -> "kestrel",   // identity: ed 0, must appear exactly once
      3L -> "kastrel",   // substitution at position 2
      4L -> "kestrels",  // insertion at the end
      5L -> "kestrl",    // deletion of the 'e'
      6L -> "castrel",   // ed 2 from kestrel — must be refined away
      7L -> "heron"))    // unrelated
    assert(found === Set(
      (1L, 2L, 0), (1L, 3L, 1), (1L, 4L, 1), (1L, 5L, 1),
      (2L, 3L, 1), (2L, 4L, 1), (2L, 5L, 1),
      (3L, 6L, 1)))      // kastrel→castrel is a single substitution
  }

  test("randomized: blocked join equals the all-pairs levenshtein scan") {
    val rnd = new scala.util.Random(20260813L)
    val alphabet = "abcd"
    val rows = (1L to 250L).map { i =>
      (i, (0 until 4 + rnd.nextInt(4))
            .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val df = rel(rows: _*)
    val blocked = pairs(df)
    val a = df.select($"id".as("ia"), $"name".as("na"))
    val b = df.select($"id".as("ib"), $"name".as("nb"))
    val brute = a.crossJoin(b).where($"ia" < $"ib")
      .withColumn("ed", levenshtein($"na", $"nb").cast("int"))
      .where($"ed" <= 1)
      .select("ia", "ib", "ed").as[(Long, Long, Int)].collect()
    assert(brute.length === brute.toSet.size)
    assert(blocked === brute.toSet)
  }

  private def pairs2(df: DataFrame): Set[(Long, Long, Int)] =
    FuzzyJoinOps.editDistancePairsK(df, 2)
      .select($"id_a", $"id_b", $"ed".cast("int")).as[(Long, Long, Int)]
      .collect().toSet

  test("ed<=2: every two-op edit class pairs; ed=3 refined away") {
    val found = pairs2(rel(
      1L -> "kestrel",
      2L -> "kastrol",   // two substitutions               → ed 2
      3L -> "kestrelly",  // two insertions at the end       → ed 2
      4L -> "kstrl",     // two deletions                   → ed 2
      5L -> "akestrel",  // one insertion, front            → ed 1
      6L -> "kastrels",  // substitution + insertion        → ed 2
      7L -> "estrul",    // deletion + substitution         → ed 2
      8L -> "castorel",  // ed 3 from kestrel — must be refined away
      9L -> "heron"))    // unrelated
    val vsOne = found.filter(p => p._1 == 1L)
    assert(vsOne === Set(
      (1L, 2L, 2), (1L, 3L, 2), (1L, 4L, 2), (1L, 5L, 1),
      (1L, 6L, 2), (1L, 7L, 2)))
    // and the threshold is really 2, not 1: the ed=1 subset alone
    // must equal what the k=1 join finds
    assert(found.filter(_._3 <= 1) === pairs(rel(
      1L -> "kestrel", 2L -> "kastrol", 3L -> "kestrelly", 4L -> "kstrl",
      5L -> "akestrel", 6L -> "kastrels", 7L -> "estrul", 8L -> "castorel",
      9L -> "heron")))
  }

  test("randomized ed<=2: blocked join equals the all-pairs levenshtein scan") {
    val rnd = new scala.util.Random(20260814L)
    val alphabet = "abc"
    val rows = (1L to 150L).map { i =>
      (i, (0 until 4 + rnd.nextInt(4))
            .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val df = rel(rows: _*)
    val blocked = pairs2(df)
    val a = df.select($"id".as("ia"), $"name".as("na"))
    val b = df.select($"id".as("ib"), $"name".as("nb"))
    val brute = a.crossJoin(b).where($"ia" < $"ib")
      .withColumn("ed", levenshtein($"na", $"nb").cast("int"))
      .where($"ed" <= 2)
      .select("ia", "ib", "ed").as[(Long, Long, Int)].collect()
    assert(brute.length === brute.toSet.size)
    assert(blocked === brute.toSet)
  }
}
