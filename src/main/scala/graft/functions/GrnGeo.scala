package graft.functions

import org.apache.spark.sql.SparkSession

/** Groonga-faithful geo scalar functions (reference lib/geo.c):
  * coordinates are WGS84GeoPoint strings `"<lat>x<lon>"` in MILLISECONDS of
  * degree (integers) or degrees (decimals auto-detected, reference
  * grn_obj_cast for GeoPoint); distances reproduce the reference's
  * approximations bit-for-bit for same-quadrant points:
  *
  *   - rectangle (default): geo_distance_rectangle_square_root
  *     (reference lib/geo.c:2343) x GRN_GEO_RADIUS 6357303
  *   - sphere ("sphr"/"sphere"): grn_geo_distance_sphere_raw
  *   - ellipsoid ("ellip"/"ellipsoid"): grn_geo_distance_ellipsoid_raw with
  *     the WGS84 constants GRN_GEO_GRS_C1/C2/C3 (lib/grn_geo.h:46-48)
  *
  * (The reference's cross-quadrant / dateline special cases,
  * lib/geo.c:2357+, are intentionally scoped out — fixture coverage is
  * same-quadrant.)
  */
object GrnGeo {

  private val Resolution = 3600000.0
  private val Radius = 6357303.0
  private val GrsC1 = 6335439.0
  private val GrsC2 = 6378137.0
  private val GrsC3 = 0.006694

  /** Parse "latxlon" → (latMsec, lonMsec). Decimal components are degrees. */
  def parseMsec(s: String): (Double, Double) = {
    val parts = s.split('x')
    require(parts.length == 2, s"bad geo point: $s")
    def one(p: String): Double =
      if (p.contains('.')) p.toDouble * Resolution else p.toDouble
    (one(parts(0)), one(parts(1)))
  }

  @inline private def rad(msec: Double): Double = (math.Pi / (Resolution * 180.0)) * msec

  def distanceRectangle(p1: String, p2: String): Double = {
    val (la1, lo1) = parseMsec(p1); val (la2, lo2) = parseMsec(p2)
    val lat1 = rad(la1); val lng1 = rad(lo1); val lat2 = rad(la2); val lng2 = rad(lo2)
    val x = (lng2 - lng1) * math.cos((lat1 + lat2) * 0.5)
    val y = lat2 - lat1
    math.sqrt(x * x + y * y) * Radius
  }

  def distanceSphere(p1: String, p2: String): Double = {
    val (la1, lo1) = parseMsec(p1); val (la2, lo2) = parseMsec(p2)
    val lat1 = rad(la1); val lng1 = rad(lo1); val lat2 = rad(la2); val lng2 = rad(lo2)
    val x = math.sin(math.abs(lng2 - lng1) * 0.5)
    val y = math.sin(math.abs(lat2 - lat1) * 0.5)
    math.asin(math.sqrt(y * y + math.cos(lat1) * math.cos(lat2) * x * x)) * 2 * Radius
  }

  def distanceEllipsoid(p1: String, p2: String): Double = {
    val (la1, lo1) = parseMsec(p1); val (la2, lo2) = parseMsec(p2)
    val lat1 = rad(la1); val lng1 = rad(lo1); val lat2 = rad(la2); val lng2 = rad(lo2)
    val p = (lat1 + lat2) * 0.5
    val q = 1 - GrsC3 * math.sin(p) * math.sin(p)
    val r = math.sqrt(q)
    val m = GrsC1 / (q * r)
    val n = GrsC2 / r
    val x = n * math.cos(p) * math.abs(lng1 - lng2)
    val y = m * math.abs(lat1 - lat2)
    math.sqrt(x * x + y * y)
  }

  def distance(p1: String, p2: String, approx: String): Double =
    approx match {
      case null | "" | "rect" | "rectangle" => distanceRectangle(p1, p2)
      case "sphr" | "sphere" => distanceSphere(p1, p2)
      case "ellip" | "ellipsoid" => distanceEllipsoid(p1, p2)
      case other => throw new IllegalArgumentException(s"approx $other")
    }

  /** geo_in_circle(point, center, radiusMeters[, approx]) → 1/0 (reference
    * lib/geo.c grn_geo_in_circle; int result so fixture `> 0` comparisons
    * typecheck through Catalyst).
    */
  private val MaxLatMsec = 90.0 * Resolution
  private val MaxLonMsec = 180.0 * Resolution

  private def validPoint(s: String): Boolean =
    try {
      val (la, lo) = parseMsec(s)
      math.abs(la) <= MaxLatMsec && math.abs(lo) <= MaxLonMsec
    } catch { case _: Exception => false }

  /** Invalid arguments are a SOFT error in the reference (rc 0, error log,
    * empty result — the geo_in_rectangle invalid-bounds fixtures):
    * predicates simply match nothing.
    */
  def inCircle(p: String, center: String, radiusM: Double, approx: String): Int =
    try {
      if (p != null && validPoint(p) && validPoint(center) &&
        distance(p, center, approx) <= radiusM) 1
      else 0
    } catch { case _: Exception => 0 }

  /** geo_in_rectangle(point, topLeft, bottomRight) → 1/0 (reference
    * grn_geo_in_rectangle_raw lib/geo.c:2170: latitude inclusive both ends;
    * longitude inclusive, with dateline wrap when left > right).
    */
  def inRectangle(p: String, topLeft: String, bottomRight: String): Int = {
    try {
      if (p == null || !validPoint(p) || !validPoint(topLeft) || !validPoint(bottomRight)) return 0
      val (la, lo) = parseMsec(p)
      val (tla, tlo) = parseMsec(topLeft)
      val (bla, blo) = parseMsec(bottomRight)
      if (la > tla || la < bla) return 0
      val lonOk =
        if (tlo > blo) lo >= tlo || lo <= blo // wrapped across the dateline
        else lo >= tlo && lo <= blo
      if (lonOk) 1 else 0
    } catch { case _: Exception => 0 }
  }

  /** Register the family as session UDFs for script-syntax filters/scorers
    * (the selector-proc registration analogue, reference lib/proc.c:5273).
    */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("geo_distance",
      (p: String, c: String) => distance(p, c, ""))
    spark.udf.register("geo_distance_approx",
      (p: String, c: String, a: String) => distance(p, c, a))
    spark.udf.register("geo_in_circle",
      (p: String, c: String, r: Double) => inCircle(p, c, r, ""))
    spark.udf.register("geo_in_circle_approx",
      (p: String, c: String, r: Double, a: String) => inCircle(p, c, r, a))
    spark.udf.register("geo_in_rectangle",
      (p: String, tl: String, br: String) => inRectangle(p, tl, br))
  }
}
