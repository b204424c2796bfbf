package graft

import java.nio.file.Files

import graft.engine.{MLPipelines, Tables}
import graft.serving.ServingFacade

/** The reference's serving composition (SURVEY §3.2-3.3): one
  * long-lived session, model preloaded from disk at construction,
  * dashboard + inference served from warm state. */
class ServingSpec extends SparkSpec {

  private lazy val facade: ServingFacade = {
    val feats = MLPipelines.featureTable(
      Tables.orders(spark, sf), Tables.customer(spark, sf)).cache()
    val (model, _, _) = MLPipelines.classification(feats)
    val dir = Files.createTempDirectory("graft_serving_").toString + "/cls"
    MLPipelines.saveModel(model, dir)
    feats.unpersist()
    new ServingFacade(spark, sf, dir)
  }

  test("dashboard rollups are bounded and non-empty") {
    val pie = facade.dashboardPie()
    val line = facade.dashboardLine()
    assert(pie.nonEmpty && pie.length <= 30)
    assert(line.nonEmpty && line.length <= 12)
  }

  test("dashboard requests read the materialized aggregate, never the fact table") {
    // the per-request executed plan must scan ONLY the MV path — the
    // reference's serving architecture (app/ml_app.py:99-139) reads
    // pre-aggregated tables exclusively; a fact scan per request is
    // the ms-vs-minutes difference at 100 TB
    val plan = facade.dashboardPiePlan.queryExecution.executedPlan.toString
    assert(plan.contains("graft_serving_mv_"),
      s"per-request plan must read the serving MV:\n$plan")
    assert(!plan.contains("orders.parquet") && !plan.contains(sf),
      s"per-request plan must not scan the fact table:\n$plan")
  }

  test("MV-served dashboards return the same rows as the fact-derived q55/q56 forms") {
    import graft.engine.{RelationalOps, Tables}
    val pieDirect = RelationalOps.dashSubAgencyRollup(Tables.orders(spark, sf))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    val pieMv = facade.dashboardPie()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(pieMv == pieDirect)
    val lineDirect = RelationalOps.dashMonthRollup(Tables.orders(spark, sf))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    val lineMv = facade.dashboardLine()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(lineMv == lineDirect)
  }

  test("single-row classify returns label + confidence from the preloaded model") {
    val known = facade.classify("1-URGENT", "O", "BUILDING", 6, 1996)
    assert(known.isDefined)
    val (label, conf) = known.get
    assert(Set("HIGH", "LOW").contains(label))
    assert(conf > 50.0 - 1e-6 && conf <= 100.0)
  }

  test("unseen category returns None (handleInvalid=skip serving branch)") {
    assert(facade.classify("NO-SUCH-PRIORITY", "O", "BUILDING", 6, 1996).isEmpty)
  }
}
