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

/** In-executor nearest-catalog-label lookup: a healpix-indexed snapshot
  * of a (small) catalog, shipped inside the expression and probed per
  * alert row — no join, no explode, no exchange on the alert side. This
  * is the Spark-native form of the reference's pattern of broadcasting
  * a catalog into pandas UDFs and querying an in-memory kd-tree per
  * batch (ref: fink_broker/ztf/science.py:57-198).
  *
  * `index` maps pixel → (name, raDeg, decDeg) entries whose match disc
  * intersects that pixel (built by [[graft.alerts.Crossmatch
  * .pixelIndex]], conservative cover). Eval probes the row's single
  * pixel and resolves by exact haversine separation; no candidate within
  * `radiusDeg` → "Unknown" (the reference's cdsxmatch default).
  *
  * Codegen calls the kernel through a reference object (the pixel index
  * can't be inlined into generated Java), so the enrichment projection
  * stays inside one whole-stage span with zero exchanges.
  */
case class NearestCatalogLabel(
    left: Expression,
    right: Expression,
    index: Map[Long, Array[(String, Double, Double)]],
    nside: Int,
    radiusDeg: Double,
    default: String = "Unknown")
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def nullable: Boolean = false
  override def prettyName: String = "nearest_catalog_label"

  @transient private lazy val defaultUtf8Val =
    org.apache.spark.unsafe.types.UTF8String.fromString(default)

  /** Null-input (or unmatched) result. */
  def defaultUtf8(): org.apache.spark.unsafe.types.UTF8String = defaultUtf8Val

  /** Nearest in-radius catalog name, shared by eval and generated code. */
  def resolve(ra: Double, dec: Double): org.apache.spark.unsafe.types.UTF8String =
    index.get(Healpix.ang2pixNest(nside, ra, dec)) match {
      case None => defaultUtf8Val
      case Some(entries) =>
        var best: String = null
        var bestSep = radiusDeg
        var i = 0
        while (i < entries.length) {
          val e = entries(i)
          val sep = SpatialFunctions.haversineDeg(ra, dec, e._2, e._3)
          if (sep <= bestSep) { best = e._1; bestSep = sep }
          i += 1
        }
        if (best == null) defaultUtf8Val
        else org.apache.spark.unsafe.types.UTF8String.fromString(best)
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val raV = left.eval(input)
    val decV = right.eval(input)
    if (raV == null || decV == null) defaultUtf8Val
    else resolve(raV.asInstanceOf[Double], decV.asInstanceOf[Double])
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val self = ctx.addReferenceObj("xmatchLabel", this,
      classOf[NearestCatalogLabel].getName)
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    // null ra/dec → the default label, never a null column value
    val resultCode =
      code"""
        ${l.code}
        ${r.code}
        org.apache.spark.unsafe.types.UTF8String ${ev.value} =
          (${l.isNull} || ${r.isNull})
            ? $self.defaultUtf8()
            : $self.resolve(${l.value}, ${r.value});
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** [[NearestCatalogLabel]] generalized to return the matched catalog
  * row's PROPERTY MAP — the shape of the reference's `mangrove`
  * map<string,string> enrichment column (nearest Mangrove galaxy within
  * 1 arcmin; ref: fink_broker/ztf/science.py:192-196, output schema
  * utest/datasets/schemas/schema_20190903.avsc). No match → every key
  * mapped to null (the reference's "None"-valued dict), so the column
  * schema is stable for downstream Avro serialization.
  *
  * `index` maps pixel → (rowId, raDeg, decDeg); `values(rowId)` holds
  * the row's property values aligned with `keys`. Plain strings are
  * stored and the Catalyst MapData instances are built once per
  * executor (@transient lazy), keeping the expression serializable.
  */
case class NearestCatalogMap(
    left: Expression,
    right: Expression,
    index: Map[Long, Array[(Int, Double, Double)]],
    keys: Array[String],
    values: Array[Array[String]],
    nside: Int,
    radiusDeg: Double)
    extends BinaryExpression {

  import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
  import org.apache.spark.unsafe.types.UTF8String

  override def dataType: DataType =
    org.apache.spark.sql.types.MapType(
      org.apache.spark.sql.types.StringType,
      org.apache.spark.sql.types.StringType, valueContainsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "nearest_catalog_map"

  @transient private lazy val keyData =
    new GenericArrayData(keys.map(UTF8String.fromString(_)).toArray[Any])
  @transient private lazy val rowMaps: Array[MapData] = values.map { vs =>
    new ArrayBasedMapData(keyData,
      new GenericArrayData(vs.map(v =>
        if (v == null) null else UTF8String.fromString(v)).toArray[Any]))
  }
  @transient private lazy val noMatch: MapData =
    new ArrayBasedMapData(keyData,
      new GenericArrayData(Array.fill[Any](keys.length)(null)))

  /** No-match (or null-input) result: every key mapped to null. */
  def noMatchMap(): MapData = noMatch

  /** Nearest in-radius catalog row's property map, shared by eval and
    * generated code. */
  def resolve(ra: Double, dec: Double): MapData =
    index.get(Healpix.ang2pixNest(nside, ra, dec)) match {
      case None => noMatch
      case Some(entries) =>
        var best = -1
        var bestSep = radiusDeg
        var i = 0
        while (i < entries.length) {
          val e = entries(i)
          val sep = SpatialFunctions.haversineDeg(ra, dec, e._2, e._3)
          if (sep <= bestSep) { best = e._1; bestSep = sep }
          i += 1
        }
        if (best < 0) noMatch else rowMaps(best)
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val raV = left.eval(input)
    val decV = right.eval(input)
    if (raV == null || decV == null) noMatch
    else resolve(raV.asInstanceOf[Double], decV.asInstanceOf[Double])
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val self = ctx.addReferenceObj("xmatchMap", this,
      classOf[NearestCatalogMap].getName)
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val resultCode =
      code"""
        ${l.code}
        ${r.code}
        org.apache.spark.sql.catalyst.util.MapData ${ev.value} =
          (${l.isNull} || ${r.isNull})
            ? $self.noMatchMap()
            : $self.resolve(${l.value}, ${r.value});
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SpatialFunctions {

  /** Haversine angular separation in degrees (scalar twin of
    * Crossmatch.angularSepDeg — stable at small separations).
    */
  def haversineDeg(ra1: Double, dec1: Double, ra2: Double, dec2: Double): Double = {
    val dLat = math.toRadians(dec2 - dec1) / 2
    val dLon = math.toRadians(ra2 - ra1) / 2
    val a = math.pow(math.sin(dLat), 2) +
      math.cos(math.toRadians(dec1)) * math.cos(math.toRadians(dec2)) *
        math.pow(math.sin(dLon), 2)
    math.toDegrees(2 * math.asin(math.sqrt(a)))
  }

  /** Column form of [[NearestCatalogLabel]]. */
  def nearestCatalogLabel(
      ra: Column,
      dec: Column,
      index: Map[Long, Array[(String, Double, Double)]],
      nside: Int,
      radiusDeg: Double,
      default: String = "Unknown"): Column =
    shims.column(
      NearestCatalogLabel(
        shims.expression(ra.cast("double")),
        shims.expression(dec.cast("double")),
        index, nside, radiusDeg, default))

  /** Column form of [[NearestCatalogMap]]. */
  def nearestCatalogMap(
      ra: Column,
      dec: Column,
      index: Map[Long, Array[(Int, Double, Double)]],
      keys: Array[String],
      values: Array[Array[String]],
      nside: Int,
      radiusDeg: Double): Column =
    shims.column(
      NearestCatalogMap(
        shims.expression(ra.cast("double")),
        shims.expression(dec.cast("double")),
        index, keys, values, nside, radiusDeg))

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
