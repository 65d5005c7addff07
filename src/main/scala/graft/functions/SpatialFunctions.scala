package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{DataType, LongType}

import graft.alerts.Healpix

/** X12 healpix pixelization as a native Catalyst expression — the
  * codegen path: `doGenCode` emits a direct static call into
  * [[graft.alerts.Healpix]], so pixelization runs inside whole-stage
  * codegen with no UDF serialization or boxing (the reference pays an
  * Arrow round-trip to healpy per batch here, ref:
  * common/spark_utils.py:519-609).
  *
  * Inputs are cast to double at the Column layer ([[SpatialFunctions
  * .ang2pix]]), so the expression sees doubles by construction.
  */
case class Ang2PixNest(left: Expression, right: Expression, nside: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "ang2pix_nest"

  override protected def nullSafeEval(ra: Any, dec: Any): Any =
    Healpix.ang2pixNest(nside, ra.asInstanceOf[Double], dec.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (ra, dec) => s"graft.alerts.Healpix.ang2pixNest($nside, $ra, $dec)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SpatialFunctions {

  /** Nested healpix pixel of (ra, dec) degree columns at `nside`. */
  def ang2pix(ra: Column, dec: Column, nside: Int): Column =
    shims.column(
      Ang2PixNest(
        shims.expression(ra.cast("double")),
        shims.expression(dec.cast("double")),
        nside))

  /** Multi-resolution pixel columns (the reference's `ang2pix_array`
    * variant) — one pixel id per requested nside.
    */
  def ang2pixMulti(ra: Column, dec: Column, nsides: Seq[Int]): Column =
    org.apache.spark.sql.functions.array(nsides.map(n => ang2pix(ra, dec, n)): _*)
}
