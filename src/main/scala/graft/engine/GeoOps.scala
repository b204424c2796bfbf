package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Exact._

/** Geocoding enrichment source (SURVEY §2.1 S6) — re-expression of the
  * reference's rate-limited Nominatim lookup loop (reference:
  * app/fetch_recipient_name_geo_data.py:35-64: name → (lat, lon) at
  * 1 request/s, results landed as a small geo dimension).
  *
  * The lookup itself is a deterministic offline formula (no egress),
  * also expressible in the oracle's SQL, so the enriched rollup is
  * fully oracle-checkable. What is real and scale-shaped is the
  * plumbing: the lookup runs as `mapPartitions` with ONE rate-limited
  * client per partition — the 100 TB form of the reference's
  * driver-side 1 req/s sleep loop (per-partition token intervals and a
  * connection pool instead of a serial driver loop; total throughput =
  * partitions / interval, tunable by repartitioning the name set) —
  * and the enriched result is a small broadcastable dimension joined
  * to the fact rollup exactly like the reference's
  * recipient_name_with_geo table (app/spark_cassandra_etl_award_amount_aggregator.py:82-84).
  */
object GeoOps {

  /** Deterministic offline geocoder: a pure length/first-codepoint
    * formula over the name (the fixture stand-in for the remote
    * lookup; positive operands so Scala % == SQL %). */
  def lookup(name: String): (Double, Double) = {
    val a = if (name.isEmpty) 0 else name.codePointAt(0)
    val lat = ((name.length * 7 + a * 3) % 120) - 60 + 0.5
    val lon = ((name.length * 13 + a * 5) % 360) - 180 + 0.25
    (lat, lon)
  }

  /** Minimal per-partition rate limiter: enforces a floor interval
    * between lookups (0 in tests; the reference's regime is 1000 ms). */
  final class RateLimitedClient(minIntervalMs: Long) extends Serializable {
    private var nextAllowed = 0L
    def geocode(name: String): (Double, Double) = {
      if (minIntervalMs > 0) {
        val now = System.nanoTime() / 1000000L
        val wait = nextAllowed - now
        if (wait > 0) Thread.sleep(wait)
        nextAllowed = math.max(now, nextAllowed) + minIntervalMs
      }
      lookup(name)
    }
  }

  /** Enrich a name column into a (name, latitude, longitude) dim via
    * per-partition rate-limited clients — NOT a per-row UDF: the
    * client (at scale: connection pool + token bucket) is constructed
    * once per partition and amortized. */
  def enrich(names: DataFrame, nameCol: String, minIntervalMs: Long = 0L): DataFrame = {
    val spark = names.sparkSession
    import spark.implicits._
    names.select(col(nameCol)).distinct().as[String]
      .mapPartitions { it =>
        val client = new RateLimitedClient(minIntervalMs)
        it.map { n => val (lat, lon) = client.geocode(n); (n, lat, lon) }
      }
      .toDF(nameCol, "latitude", "longitude")
  }

  /** The reference's A1 flagship shape over the enriched dim:
    * geo ⋈ fact → groupBy(key, lat, lon) → SUM
    * (app/spark_cassandra_etl_award_amount_aggregator.py:82-84). The
    * enriched dim is 25 rows — broadcast, the fact never shuffles for
    * the join. */
  def geoEnrichedRollup(lineitem: DataFrame, supplier: DataFrame, nation: DataFrame): DataFrame = {
    val geo = enrich(nation.select(col("n_name")), "n_name")
    lineitem
      .join(broadcast(supplier), lineitem("l_suppkey") === supplier("s_suppkey"))
      .join(broadcast(nation), supplier("s_nationkey") === nation("n_nationkey"))
      .join(broadcast(geo), "n_name")
      .groupBy(col("n_name"), col("latitude"), col("longitude"))
      .agg(decSum(col("l_extendedprice")).as("total_amount"),
           count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))
  }
}
