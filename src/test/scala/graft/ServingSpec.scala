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
