package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, FloatType, LongType}

/** Banded sign-hyperplane LSH signatures in ONE kernel: for a vector v
  * and a flattened plane matrix [p₀ | p₁ | …] (dim floats each), band
  * b's bucket id sets bit j iff v · p_{b·rows+j} > 0 — the blocking key
  * of `sim_emb_neardup` (SURVEY.md §2.9; reference near-dup mandate).
  *
  * Why not `rows × bands` separate `DotProductFloat` `when`-chains: a
  * projection holding 88 inlined 64-iteration dot loops compiles into
  * one whole-stage method far past the JIT's huge-method threshold, so
  * the stage executes in the BYTECODE INTERPRETER — measured 10 s for
  * 20k rows at sf1 where this kernel's two tight loops (JIT-compiled,
  * plane matrix walked sequentially) do the identical arithmetic in
  * ~0.3 s. Same left-to-right double accumulation per plane as
  * `DotProductFloat`, so the DuckDB oracle's `list_sum` dot matches
  * bit-for-bit; bit j = sign test `> 0.0` exactly as the oracle's CASE.
  *
  * `rows` (planes per band) is a plan-time constant; the band count is
  * planes.length / (rows · dim), derived from the literal at eval time
  * so one expression serves every corpus-scaled signature width. */
case class SignBandsFloat(left: Expression, right: Expression, rows: Int)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_bands_f"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val vec = a.asInstanceOf[ArrayData]
    val planes = b.asInstanceOf[ArrayData]
    val dim = vec.numElements()
    val nPlanes = if (dim == 0) 0 else planes.numElements() / dim
    val out = new Array[Long](if (rows == 0) 0 else nPlanes / rows)
    var p = 0
    while (p < out.length * rows) {
      var acc = 0.0
      val base = p * dim
      var i = 0
      while (i < dim) {
        acc += planes.getFloat(base + i).toDouble * vec.getFloat(i).toDouble
        i += 1
      }
      if (acc > 0.0) out(p / rows) |= 1L << (p % rows)
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vec, planes) => {
      val dim = ctx.freshName("dim")
      val nOut = ctx.freshName("nOut")
      val out = ctx.freshName("out")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val base = ctx.freshName("base")
      s"""
         |int $dim = $vec.numElements();
         |int $nOut = ($dim == 0 || $rows == 0)
         |  ? 0 : ($planes.numElements() / $dim) / $rows;
         |long[] $out = new long[$nOut];
         |for (int $p = 0; $p < $nOut * $rows; $p++) {
         |  double $acc = 0.0;
         |  int $base = $p * $dim;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    $acc += ((double) $planes.getFloat($base + $i))
         |          * ((double) $vec.getFloat($i));
         |  }
         |  if ($acc > 0.0) $out[$p / $rows] |= 1L << ($p % $rows);
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SignBandsFloat =
    copy(left = newLeft, right = newRight)
}

object SignBandsFloat {
  /** Column-API entry point: banded bucket ids for `vec` against the
    * flattened `planes` literal, `rows` bits per band. */
  def signBands(vec: Column, planes: Column, rows: Int): Column =
    ExpressionUtils.column(SignBandsFloat(
      ExpressionUtils.expression(vec), ExpressionUtils.expression(planes), rows))
}
