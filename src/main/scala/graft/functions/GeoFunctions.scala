package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geo helpers (reference `graph_engine/src/geo.rs:33-56` Haversine and
  * radius search). Pure column composition over built-in trig — fully
  * codegen'd, no UDF.
  */
object GeoFunctions {
  private val EarthRadiusKm = 6371.0

  /** Great-circle distance in km between (lat1,lon1) and (lat2,lon2),
    * Haversine formula.
    */
  def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = pow(sin(dLat), 2) + cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)
    lit(2 * EarthRadiusKm) * asin(sqrt(a))
  }
}
