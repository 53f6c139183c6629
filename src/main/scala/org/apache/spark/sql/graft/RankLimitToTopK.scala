package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.RowNumber
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (extension path: `Rule[LogicalPlan]` via
  * `SparkSessionExtensions`) that lowers Spark's own rank-limit
  * inference to the engine's native heap operator.
  *
  * Catalyst's `InferWindowGroupLimit` already recognizes the
  * `row_number() OVER (PARTITION BY k ORDER BY o) <= K` idiom — filter
  * above ranking window — and inserts a logical `WindowGroupLimit`
  * pruning node. Its stock execution is SORT-based: every map partition
  * fully sorts its rows per key before discarding all but K
  * (`WindowGroupLimitExec` requires child ordering). This rule swaps
  * that node for [[TopKPerKeyPlan]], whose exec keeps a bounded K-row
  * heap per key on BOTH sides of the exchange — O(rows·log K) with no
  * sort buffer, and the shuffle still moves only O(keys·K) rows.
  *
  * The net effect: any user query written in the plain window idiom —
  * SQL or DataFrame — gets the native operator automatically; nobody
  * has to know `TopKPerKey` exists. Reusing Spark's inference (rather
  * than re-matching Filter-over-Window here) keeps the rewrite in
  * lockstep with Catalyst's own conjunct/rank-function analysis.
  *
  * Scope guards:
  *  - `RowNumber` only: the heap emits exactly K rows per key, which is
  *    row_number semantics; rank/dense_rank must keep >K rows on ties,
  *    so those stay on the stock path.
  *  - non-empty partition spec: a global top-K (no PARTITION BY) plans
  *    a ClusteredDistribution over zero expressions; Spark's own limit
  *    machinery already handles that case well.
  *  - K ≤ 1024 bounds heap memory (mirrors Spark's
  *    windowGroupLimitThreshold discipline).
  */
object RankLimitToTopK extends Rule[LogicalPlan] {

  private[graft] val MaxK = 1024

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case WindowGroupLimit(parts, order, _: RowNumber, k, child)
        if parts.nonEmpty && k > 0 && k <= MaxK &&
           !child.isInstanceOf[TopKPerKeyPlan] =>
      TopKPerKeyPlan(k, parts, order, child)
  }

  /** Imperative registration (idempotent) for driver-constructed
    * sessions that don't set `spark.sql.extensions`; the rule runs in
    * the "User Provided Optimizers" batch, which sits after
    * `InferWindowGroupLimit` — exactly where the lowering must be. */
  def ensureRegistered(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(RankLimitToTopK)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RankLimitToTopK
    }
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    }
  }
}
