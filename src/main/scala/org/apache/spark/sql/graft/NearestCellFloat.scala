package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, FloatType, LongType}

/** Nearest-centroid assignment in ONE kernel: for vector v and a
  * flattened centroid matrix [c₀ | c₁ | …] (dim floats each), returns
  * the index of the centroid maximizing the 6-decimal-truncated cosine
  * `floor((v · c) · 10⁶)`, ties to the SMALLEST index — exactly the
  * ordering of the when-chain `array_min((-cos6(dot), id))` idiom and
  * of the oracle's `row_number() ORDER BY cos6 DESC, vec_id`.
  *
  * Exists for the same reason as [[SignBandsFloat]]: a corpus-scaled
  * cell count k stacks k inlined 64-step dot loops into one
  * whole-stage method, which past a few hundred iterations of bytecode
  * trips the JIT huge-method threshold and drops the stage to the
  * bytecode interpreter. One two-loop kernel keeps assignment a
  * shuffle-free JIT-compiled projection at any k. Accumulation is the
  * same left-to-right double fold as [[DotProductFloat]]; the truncated
  * comparison is on `floor(acc·10⁶)` doubles, bit-identical to
  * `cos6`'s `floor(x·1000000.0)/1000000.0` ordering (dividing by the
  * same positive constant preserves order and equality). */
case class NearestCellFloat(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_cell_f"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val vec = a.asInstanceOf[ArrayData]
    val cents = b.asInstanceOf[ArrayData]
    val dim = vec.numElements()
    val k = if (dim == 0) 0 else cents.numElements() / dim
    var best = 0L
    var bestVal = Double.NegativeInfinity
    var c = 0
    while (c < k) {
      var acc = 0.0
      val base = c * dim
      var i = 0
      while (i < dim) {
        acc += cents.getFloat(base + i).toDouble * vec.getFloat(i).toDouble
        i += 1
      }
      val t = math.floor(acc * 1000000.0)
      if (t > bestVal) { bestVal = t; best = c.toLong }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vec, cents) => {
      val dim = ctx.freshName("dim")
      val k = ctx.freshName("k")
      val best = ctx.freshName("best")
      val bestVal = ctx.freshName("bestVal")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val base = ctx.freshName("base")
      val t = ctx.freshName("t")
      s"""
         |int $dim = $vec.numElements();
         |int $k = ($dim == 0) ? 0 : $cents.numElements() / $dim;
         |long $best = 0L;
         |double $bestVal = Double.NEGATIVE_INFINITY;
         |for (int $c = 0; $c < $k; $c++) {
         |  double $acc = 0.0;
         |  int $base = $c * $dim;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    $acc += ((double) $cents.getFloat($base + $i))
         |          * ((double) $vec.getFloat($i));
         |  }
         |  double $t = java.lang.Math.floor($acc * 1000000.0);
         |  if ($t > $bestVal) { $bestVal = $t; $best = (long) $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCellFloat =
    copy(left = newLeft, right = newRight)
}

object NearestCellFloat {
  /** Column-API entry point: index (0-based) of the nearest centroid in
    * the flattened `centroids` literal under truncated-cosine order. */
  def nearestCell(vec: Column, centroids: Column): Column =
    ExpressionUtils.column(NearestCellFloat(
      ExpressionUtils.expression(vec), ExpressionUtils.expression(centroids)))
}
