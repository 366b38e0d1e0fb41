package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Geospatial primitives: great-circle distance and the two join shapes
  * built on it — nearest-site assignment against a bounded site table,
  * and radius matching against an unbounded one via grid-cell blocking.
  *
  * The scale story mirrors [[Similarity]]: never score all pairs.
  * A bounded site table (thousands of rows) broadcasts and the argmin
  * is a map-side scan; an unbounded one routes through integer grid
  * cells sized to the query radius, so each point scores only its own
  * 3x3 cell neighborhood.
  */
object Geo {

  /** Mean-Earth radius (km), the conventional haversine constant. */
  val EarthRadiusKm = 6371.0088

  /** Haversine great-circle distance in km between (lat1, lon1) and
    * (lat2, lon2) in degrees. Pure trig column expression — codegen'd,
    * no UDF.
    */
  def haversineKm(lat1: Column, lon1: Column,
      lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = sin(dLat) * sin(dLat) +
      cos(radians(lat1)) * cos(radians(lat2)) * sin(dLon) * sin(dLon)
    lit(2.0 * EarthRadiusKm) * asin(sqrt(a))
  }

  /** Nearest site per point against a BOUNDED site table (broadcast
    * argmin; the caller owns the bound). Ties break by site id.
    * Output: every point column + (siteIdCol, distance_km).
    *
    * `idCols` names the point table's unique key (the argmin window
    * partitions on it) — mirroring the idCols contract of
    * `Network.mostSpecific`. Partitioning on all point columns instead
    * would silently collapse fully-duplicate point rows to one output
    * row, losing points whenever the table lacks a unique id.
    */
  def nearestSite(
      points: DataFrame,
      idCols: Seq[String],
      pLat: String, pLon: String,
      sites: DataFrame,
      siteIdCol: String, sLat: String, sLon: String): DataFrame = {
    require(idCols.nonEmpty, "nearestSite needs the point table's unique id columns")
    val scored = points.join(broadcast(sites))
      .withColumn("__d",
        haversineKm(col(pLat), col(pLon), col(sLat), col(sLon)))
    val w = Window.partitionBy(idCols.map(col): _*)
      .orderBy(col("__d"), col(siteIdCol))
    scored.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__rk", sLat, sLon)
      .withColumnRenamed("__d", "distance_km")
  }

  /** Grid cell id at `cellDeg` degree resolution — the blocking key for
    * [[radiusJoin]]. Integer floor on both axes packed into one long.
    */
  def cellId(lat: Column, lon: Column, cellDeg: Double): Column =
    floor((lat + 90.0) / cellDeg).cast("long") * 100000L +
      floor((lon + 180.0) / cellDeg).cast("long")

  /** All points within `radiusKm` of any site, for UNBOUNDED site
    * tables: both sides key by grid cell, sites replicate to their 3x3
    * cell neighborhood (a constant 9x fan-out), and the haversine
    * filter runs only within the blocked pairs. `cellDeg` must be at
    * least the radius in degrees at the worst latitude the data
    * carries — the caller picks it; the 3x3 neighborhood then
    * guarantees no within-radius pair crosses more than one cell
    * boundary per axis. Longitude wrap-around at the +/-180 meridian
    * is NOT blocked across (documented limitation; shift coordinates
    * if the data straddles it).
    */
  def radiusJoin(
      points: DataFrame,
      pLat: String, pLon: String,
      sites: DataFrame,
      sLat: String, sLon: String,
      radiusKm: Double,
      cellDeg: Double): DataFrame = {
    val off = explode(array(
      (for (dy <- -1 to 1; dx <- -1 to 1)
        yield struct(lit(dy).as("dy"), lit(dx).as("dx"))): _*))
    val s = sites
      .withColumn("__o", off)
      .withColumn("__cell",
        (floor((col(sLat) + 90.0) / cellDeg).cast("long") + col("__o.dy")) *
          100000L +
          (floor((col(sLon) + 180.0) / cellDeg).cast("long") + col("__o.dx")))
      .drop("__o")
    points
      .withColumn("__cell", cellId(col(pLat), col(pLon), cellDeg))
      .join(s, Seq("__cell"))
      .withColumn("distance_km",
        haversineKm(col(pLat), col(pLon), col(sLat), col(sLon)))
      .filter(col("distance_km") <= radiusKm)
      .drop("__cell")
  }
}
