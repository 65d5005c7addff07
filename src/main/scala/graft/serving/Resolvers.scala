package graft.serving

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Name-resolution serving indices — the reference's two resolver jobs
  * re-expressed in-engine:
  *
  *   - SSO resolver (ref: bin/ztf/archive_sso_resolver.py:78-238): from
  *     the per-object lightcurve aggregation, build one lookup row per
  *     alias — resolved MPC name, resolved MPC number (when valid), and
  *     the survey-native designation — all pointing back at the native
  *     id; decimal keys order numerically before non-decimal keys;
  *     duplicate keys get "@k" occurrence suffixes so every serving row
  *     key stays unique; keys are lowercased (case-insensitive lookup).
  *   - TNS resolver (ref: bin/ztf/tns_resolver.py:40-71): an external
  *     catalog snapshot keyed by a concatenated, lowercased row key.
  *
  * The reference does all of this driver-side in pandas (concat +
  * isdecimal sort + recursive duplicate marking). In-engine: the alias
  * fan-out is a 3-way union of projections, the decimal-aware order is
  * one orderBy on a (class, numeric-value, key) triple, and the
  * recursive duplicate marking collapses to a single window
  * `row_number() - 1` per key — one keyed shuffle, no driver round
  * trip, so the index build scales with the catalog, not the driver's
  * memory. Resolution itself (the reference calls the external quaero
  * service) is an input column here: callers attach resolved
  * name/number however they obtain them.
  */
object Resolvers {

  // Bounded to 18 digits: under ANSI mode a longer all-digit key would
  // overflow the later cast('long') and fail the whole index build; the
  // pandas reference (arbitrary-precision int) sorts it fine. Oversized
  // keys fall into the lexical class instead — ordering differs from the
  // reference only for >18-digit designations, which do not occur.
  private def isDecimal(c: Column): Column = c.rlike("^[0-9]{1,18}$")

  /** One lookup row per alias: (alias → native id, resolved name,
    * resolved number). `agg` must carry one row per object with
    * `nativeCol` (never null), `nameCol` (resolved name, null when the
    * resolver failed — falls back to the native id, as the reference
    * fills None with ssnamenr), and `numberCol` (resolved number as a
    * string, null when the object is unnumbered).
    */
  def ssoResolverIndex(
      agg: DataFrame,
      nativeCol: String = "ssnamenr",
      nameCol: String = "sso_name",
      numberCol: String = "sso_number"): DataFrame = {
    val base = agg.select(
      col(nativeCol).as("native"),
      coalesce(col(nameCol), col(nativeCol)).as("name"),
      col(numberCol).cast("string").as("number"))
    // the reference's three concatenated blocks: names, valid numbers,
    // native designations — each aliasing back to the same native id
    val byName = base.select(col("name").as("ssodnet"),
      col("native").as("ssnamenr"), col("name"), col("number"),
      lit(0).as("blk"))
    val byNumber = base.filter(col("number").isNotNull)
      .select(col("number").as("ssodnet"),
        col("native").as("ssnamenr"), col("name"), col("number"),
        lit(1).as("blk"))
    val byNative = base.select(col("native").as("ssodnet"),
      col("native").as("ssnamenr"), col("name"), col("number"),
      lit(2).as("blk"))
    val unioned = byName.unionByName(byNumber).unionByName(byNative)
    // duplicate keys → "@k" occurrence suffix, numbered in the
    // deterministic (block, native-id) order. The occurrence window
    // partitions on the LOWERCASED key — the suffix exists to keep the
    // final (lowercased) serving row keys unique, so aliases differing
    // only in case must share one occurrence sequence.
    val w = Window.partitionBy(lower(col("ssodnet")))
      .orderBy(col("blk"), col("ssnamenr"))
    unioned
      .withColumn("occ", row_number().over(w) - 1)
      .withColumn("raw", col("ssodnet"))
      .withColumn("ssodnet",
        lower(concat(col("ssodnet"), lit("@"), col("occ").cast("string"))))
      // decimal-aware global order on the RAW key (the reference sorts
      // before marking duplicates): numeric keys ascending first, then
      // the rest lexically — one range shuffle over the index, which is
      // catalog-sized, not lake-sized
      .withColumn("numkey",
        when(isDecimal(col("raw")), col("raw").cast("long")))
      .orderBy(
        when(col("numkey").isNotNull, 0).otherwise(1),
        col("numkey"), col("ssodnet"))
      .select("ssodnet", "ssnamenr", "name", "number")
  }

  /** Write the SSO resolver as a point-lookup serving table keyed on the
    * alias (the reference's `.sso_resolver` HBase push). */
  def writeSsoResolver(index: DataFrame, path: String): Unit =
    ServingTable.write(index, path, keyCols = Seq("ssodnet"),
      saltSource = "ssodnet")

  /** TNS resolver index: the key component columns lowercased in place
    * (the reference lowercases the whole row key — case-insensitive
    * lookup), plus the concatenated `tns_key` for inspection. The
    * serving key algebra stays on the component columns so point
    * lookups parse "<a>_<b>" keys against the declared layout. */
  def tnsResolverIndex(catalog: DataFrame, keyCols: Seq[String]): DataFrame = {
    val lowered = keyCols.foldLeft(catalog)(
      (d, c) => d.withColumn(c, lower(col(c))))
    lowered.withColumn("tns_key", concat_ws("_", keyCols.map(col): _*))
  }

  /** Write the TNS resolver keyed on the component columns. */
  def writeTnsResolver(index: DataFrame, path: String,
      keyCols: Seq[String]): Unit =
    ServingTable.write(index, path, keyCols = keyCols,
      saltSource = keyCols.head)
}
