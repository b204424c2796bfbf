package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over the host-link graph — the web-curation half
  * the URL/domain family (WebOps) feeds: crawl frontiers, domain
  * authority priors for quality weighting, and mirror-cluster
  * structure are all graph questions over hosts, not rows. (Extension
  * surface; the reference has no graph layer.)
  *
  * Everything here is expressed as joins + keyed aggregates over an
  * EDGE TABLE — the Spark-native graph representation: no driver-side
  * adjacency, no vertex mutation, each iteration one co-partitioned
  * join and one shuffle on the destination key. Ranks use scaled
  * BIGINT fixed-point with floor division so every iteration is
  * bit-reproducible on any engine and any partitioning (float
  * PageRank sums are accumulation-order-dependent; integer sums are
  * not).
  */
object GraphOps {

  /** Fixed-point scale: ranks are integers in units of 1e-12. */
  val Scale: Long = 1000000000000L

  /** Synthetic host-link edge table from the documents fixture: each
    * doc "links" its host to the host of a deterministically-chosen
    * partner doc (`xxhash64(doc_id) pmod n_docs` — doc_ids are
    * contiguous 0..n-1, TESTDATA.md), aggregated to
    * (src_host, dst_host, w). Real corpora skip this adapter and
    * aggregate their outlink table the same way.
    *
    * Scale: one broadcast of the 1-row count, one self-join on the
    * partner id (equi-join, co-partitionable), one rollup keyed by
    * the host pair — host-pair cardinality is registry-bounded, never
    * corpus-sized. */
  def hostLinks(documents: DataFrame): DataFrame = {
    val hosts = WebOps.hostParts(WebOps.syntheticUrls(documents))
      .select(col("doc_id"), col("host"))
      .localCheckpoint(false) // src side + partner lookup both read it
    val n = hosts.agg(count(lit(1)).as("n_docs"))
    val withDst = hosts.crossJoin(broadcast(n))
      .select(col("host").as("src_host"),
        pmod(xxhash64(col("doc_id")), col("n_docs")).as("dst_doc"))
    withDst.join(hosts.select(col("doc_id").as("dst_doc"), col("host").as("dst_host")),
        "dst_doc")
      .groupBy(col("src_host"), col("dst_host"))
      .agg(count(lit(1)).cast("long").as("w"))
  }

  /** Deterministic fixed-point PageRank, `iters` synchronous
    * iterations at damping 0.85: rank mass is a scaled BIGINT
    * (×1e12), each edge carries `(rank·w) div out_w` to its
    * destination, and the new rank is
    * `(15·(S div n)) div 100 + (85·inflow) div 100`. Floor division
    * everywhere ⇒ the result replays bit-exact in any engine —
    * the mass lost to flooring is deterministic too.
    *
    * Scale shape: the edge table is checkpointed once and re-joined
    * per iteration — each iteration is one equi-join on src (edges ×
    * ranks, both hashed on the same key) and one shuffle on dst for
    * the inflow sum; node cardinality is host-registry-bounded. With
    * BIGINT, `rank·w` needs w ≤ 9.2e6 at full rank mass — beyond
    * that, widen the contribution arithmetic to DECIMAL(38,0), same
    * plan. Dangling hosts cannot occur here (every host's docs emit
    * out-links); a real outlink table adds the standard dangling-mass
    * redistribution term first. */
  def pagerank(edges: DataFrame, iters: Int = 3): DataFrame = {
    val e = edges.localCheckpoint(false) // re-read every iteration
    val outw = e.groupBy(col("src_host")).agg(sum(col("w")).as("out_w"))
      .localCheckpoint(false)
    val nodes = e.select(col("src_host").as("host"))
      .union(e.select(col("dst_host").as("host"))).distinct()
      .crossJoin(broadcast(e.select(col("src_host")).union(e.select(col("dst_host")))
        .distinct().agg(count(lit(1)).as("n_nodes"))))
      .withColumn("base", expr(s"(15 * ($Scale DIV n_nodes)) DIV 100"))
      .localCheckpoint(false) // anchors every iteration's left join
    var r = nodes.select(col("host"), expr(s"$Scale DIV n_nodes").as("rank"))
    for (_ <- 1 to iters) {
      val inflow = e.join(r.withColumnRenamed("host", "src_host"), "src_host")
        .join(outw, "src_host")
        .select(col("dst_host").as("host"),
          expr("(rank * w) DIV out_w").as("contrib"))
        .groupBy(col("host"))
        .agg(sum(col("contrib")).as("inflow"))
      r = nodes.join(inflow, Seq("host"), "left_outer")
        .select(col("host"),
          (col("base") + expr("(85 * coalesce(inflow, 0L)) DIV 100")).as("rank"))
    }
    r.join(outw.select(col("src_host").as("host"), col("out_w")), Seq("host"), "left_outer")
      .select(col("host"),
        coalesce(col("out_w"), lit(0L)).cast("long").as("out_weight"),
        col("rank").cast("long").as("rank_fp"),
        (col("rank").cast("double") / Scale.toDouble).as("rank"))
      .orderBy(col("host"))
  }

  /** BFS hop distances from a deterministic seed (the host with the
    * greatest total link weight, host-ascending tie-break) over the
    * undirected host graph, `iters` synchronous relaxation rounds —
    * the reachability probe for crawl-frontier and mirror-cluster
    * questions ("how many hops from the hub is this host?"). Each
    * round is one join frontier×edges + one min-rollup — the
    * standard scalable BFS (no per-vertex driver loop); unreached
    * hosts report distance −1.
    *
    * Rounds bound the answer at `iters` hops (dist > iters reads as
    * unreached) — callers iterate to the diameter or fixpoint; the
    * fixed unroll here keeps the op oracle-replayable. */
  def bfsHops(edges: DataFrame, iters: Int = 3): DataFrame = {
    val und = edges.filter(col("src_host") =!= col("dst_host"))
      .select(least(col("src_host"), col("dst_host")).as("u"),
        greatest(col("src_host"), col("dst_host")).as("v"))
      .distinct()
      .localCheckpoint(false) // seed pick + every relaxation round
    val bidir = und.select(col("u").as("a"), col("v").as("b"))
      .union(und.select(col("v").as("a"), col("u").as("b")))
    val nodes = bidir.select(col("a").as("host")).distinct()
    val seed = edges.groupBy(col("src_host")).agg(sum(col("w")).as("tw"))
      .orderBy(col("tw").desc, col("src_host")).limit(1)
      .select(col("src_host").as("host"))
    var dist = nodes.join(broadcast(seed.withColumn("d0", lit(0L))),
        Seq("host"), "left_outer")
      .select(col("host"), col("d0").as("dist")) // null = unreached
    for (_ <- 1 to iters) {
      val relaxed = bidir.join(dist.withColumnRenamed("host", "a"), "a")
        .filter(col("dist").isNotNull)
        .select(col("b").as("host"), (col("dist") + 1).as("cand"))
        .groupBy(col("host")).agg(min(col("cand")).as("cand"))
      // explicit null-handling CASE: Spark's least() skips NULLs but
      // that behavior is not portable — the oracle replays this CASE
      dist = dist.join(relaxed, Seq("host"), "left_outer")
        .select(col("host"),
          when(col("dist").isNull, col("cand"))
            .when(col("cand").isNull, col("dist"))
            .when(col("cand") < col("dist"), col("cand"))
            .otherwise(col("dist")).as("dist"))
    }
    dist.select(col("host"), coalesce(col("dist"), lit(-1L)).as("dist"))
      .orderBy(col("host"))
  }

  /** Per-host triangle participation over the UNDIRECTED host graph
    * (self-loops dropped, edges canonicalized u<v, weights ignored).
    * Uses the degree-ordered orientation: each edge points from its
    * lower-(degree, host) endpoint to the higher, so every wedge is
    * enumerated exactly once at its lowest-degree vertex — the
    * standard O(m^1.5) bound that keeps hub fanout from exploding the
    * wedge join (a lexicographic orientation lets one hot hub
    * enumerate its whole neighborhood squared). Triangles then
    * attribute to all three corners via one explode + rollup.
    *
    * Scale: two self-joins on the oriented edge table, both equi-joins
    * on a host key; wedge volume is sum-of-squared-OUT-degrees, which
    * degree-ordering bounds by O(m^1.5) regardless of skew. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val und = edges.filter(col("src_host") =!= col("dst_host"))
      .select(least(col("src_host"), col("dst_host")).as("u"),
        greatest(col("src_host"), col("dst_host")).as("v"))
      .distinct()
      .localCheckpoint(false) // degree rollup + both join sides read it
    val deg = und.select(col("u").as("h")).union(und.select(col("v").as("h")))
      .groupBy(col("h")).agg(count(lit(1)).cast("long").as("deg"))
    val oriented = und
      .join(deg.select(col("h").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("h").as("v"), col("deg").as("dv")), "v")
      .select(
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          col("u")).otherwise(col("v")).as("a"),
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          col("v")).otherwise(col("u")).as("b"))
      .localCheckpoint(false) // wedge pivot + closure probe read it
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.a") === col("e2.a") && col("e1.b") < col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    // the closing edge may be oriented either way between y and z
    val tri = wedges.join(oriented,
        (col("a") === col("y") && col("b") === col("z")) ||
        (col("a") === col("z") && col("b") === col("y")))
      .select(col("x"), col("y"), col("z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("host"))
      .groupBy(col("host"))
      .agg(count(lit(1)).cast("long").as("n_triangles"))
      .join(deg.select(col("h").as("host"), col("deg")), Seq("host"), "right_outer")
      .select(col("host"), col("deg").as("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .orderBy(col("host"))
  }

  /** Deterministic integer HITS — hub/authority scores over the same
    * edge table ([[pagerank]]'s complement: PageRank rewards being
    * linked FROM anywhere, HITS separates "links to good pages" (hub)
    * from "linked by good hubs" (authority) — the mirror-farm signal:
    * a link farm scores hub-high/authority-low). `iters` synchronous
    * rounds of a ← Σ_in h·w then h ← Σ_out a·w, each followed by the
    * L1 normalization (x·S) DIV Σx in scaled-BIGINT fixed point —
    * sums of integers are accumulation-order-free and floor division
    * is exact, so every round replays bit-identical in any engine
    * (the numerator rides DECIMAL(38,0): score·S is ~10²⁸). Same
    * scale shape as pagerank: per round two co-partitioned equi-joins
    * + two keyed aggregates; the normalizer is a 1-row broadcast. */
  def hits(edges: DataFrame, iters: Int = 2): DataFrame = {
    val e = edges.select(col("src_host").as("src"), col("dst_host").as("dst"), col("w"))
      .localCheckpoint(false) // re-joined every round
    val nodes = e.select(col("src").as("host"))
      .unionByName(e.select(col("dst").as("host"))).distinct()
      .localCheckpoint(false)
    def normalize(raw: DataFrame, key: String, rawCol: String, out: String): DataFrame = {
      val s = raw.agg(sum(col(rawCol)).as("s"))
      nodes.join(raw.withColumnRenamed(key, "host"), Seq("host"), "left_outer")
        .crossJoin(broadcast(s))
        .select(col("host"),
          expr(s"CAST(COALESCE($rawCol, 0) AS DECIMAL(38,0)) * $Scale DIV s").as(out))
    }
    var hub = nodes.select(col("host"), lit(Scale).as("h"))
    var auth = nodes.select(col("host"), lit(0L).as("a"))
    for (_ <- 1 to iters) {
      auth = normalize(
        e.join(hub.select(col("host").as("src"), col("h")), "src")
          .groupBy(col("dst")).agg(sum(col("h") * col("w")).as("a_raw")),
        "dst", "a_raw", "a")
      hub = normalize(
        e.join(auth.select(col("host").as("dst"), col("a")), "dst")
          .groupBy(col("src")).agg(sum(col("a") * col("w")).as("h_raw")),
        "src", "h_raw", "h")
    }
    hub.join(auth, "host")
      .select(col("host"), col("h").as("hub_fp"), col("a").as("auth_fp"),
        (col("h").cast("double") / Scale).as("hub"),
        (col("a").cast("double") / Scale).as("authority"))
      .orderBy(col("host"))
  }
}
