package graft.engine

import org.apache.spark.ml.{Pipeline, PipelineModel, PipelineStage}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.evaluation.{BinaryClassificationEvaluator, RegressionEvaluator}
import org.apache.spark.ml.feature.{OneHotEncoder, StringIndexer, VectorAssembler}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.ml.stat.Correlation
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ML pipeline surface (SURVEY §2.10, M1-M9) — the reference's entire
  * extensibility layer re-expressed in Scala spark.ml.
  *
  * Reference semantics preserved exactly:
  *  - StringIndexer handleInvalid="skip" (app/machine_learning_models.py:220)
  *    silently drops rows with unseen categories at inference — the
  *    empty-prediction branch the serving layer checks (app/ml_app.py:212);
  *  - categorical columns with <2 distinct values are gated out before
  *    indexing (app/machine_learning_models.py:159-167) — here as ONE
  *    multi-countDistinct aggregate instead of the reference's serial
  *    per-column distinct().count() jobs;
  *  - classification label = amount > approx-median (:237-242);
  *  - seeds pinned (randomSplit 42, KMeans 42) for reproducibility.
  *
  * Deliberate divergence (SURVEY §4.3 — reference inefficiencies we do
  * not reproduce): the reference re-fits its StringIndexers once for
  * the correlation path and again inside every pipeline; here the
  * indexer + one-hot stages are fit ONCE over the feature table
  * ([[fitEncoders]]) and the fitted transformers are shared across the
  * correlation/regression/classification/clustering pipelines.
  */
object MLPipelines {

  /** Feature table: orders ⋈ customer (the awards-fact analog, SURVEY
    * §7.2) with derived month/year and the reference's preprocessing —
    * dropna on required cols + positive-amount filter
    * (app/machine_learning_models.py:145-149). */
  def featureTable(orders: DataFrame, customer: DataFrame): DataFrame =
    orders.join(customer, orders("o_custkey") === customer("c_custkey"))
      .na.drop(Seq("o_totalprice", "o_orderdate", "o_orderpriority", "o_orderstatus", "c_mktsegment"))
      .filter(col("o_totalprice") > 0)
      .withColumn("o_month", month(col("o_orderdate")))
      .withColumn("o_year", year(col("o_orderdate")))
      .select(col("o_orderkey"), col("o_totalprice"), col("o_month"), col("o_year"),
              col("o_orderpriority"), col("o_orderstatus"), col("c_mktsegment"))

  val CategoricalCols: Seq[String] = Seq("o_orderpriority", "o_orderstatus", "c_mktsegment")
  val NumericCols: Seq[String] = Seq("o_month", "o_year")

  /** The reference's distinct-count gate (A5): keep categoricals with
    * at least 2 distinct values. One agg(countDistinct...) pass — a
    * single job regardless of column count. */
  def usableCategoricals(df: DataFrame, cols: Seq[String] = CategoricalCols): Seq[String] =
    if (cols.isEmpty) Seq.empty
    else {
      val row = df.agg(
        countDistinct(col(cols.head)).as(cols.head),
        cols.tail.map(c => countDistinct(col(c)).as(c)): _*).head()
      cols.filter(c => row.getAs[Long](c) >= 2)
    }

  /** Fitted, shareable encoding stages: StringIndexerModels (skip
    * semantics) + OneHotEncoderModel, fit once over the feature table. */
  final case class FittedEncoders(cats: Seq[String], stages: Array[PipelineStage],
                                  vecCols: Array[String])

  def fitEncoders(features: DataFrame, cats0: Seq[String] = null): FittedEncoders = {
    val cats = Option(cats0).getOrElse(usableCategoricals(features))
    val indexers = cats.map(c =>
      new StringIndexer().setInputCol(c).setOutputCol(s"${c}_idx").setHandleInvalid("skip"))
    val encoder = new OneHotEncoder()
      .setInputCols(cats.map(c => s"${c}_idx").toArray)
      .setOutputCols(cats.map(c => s"${c}_vec").toArray)
    val fitted = new Pipeline().setStages((indexers :+ encoder).toArray).fit(features)
    FittedEncoders(cats, fitted.stages.map(s => s: PipelineStage),
                   cats.map(c => s"${c}_vec").toArray)
  }

  /** Pearson correlation matrix over assembled numeric + indexed
    * categorical features (M1/M3/A8 — app/machine_learning_models.py:170-191).
    * Returns (feature_i, feature_j, corr) rows — the engine emits the
    * matrix as a DataFrame; rendering is out of scope (SURVEY S10). */
  def correlationMatrix(features: DataFrame, enc0: FittedEncoders = null): DataFrame = {
    val enc = Option(enc0).getOrElse(fitEncoders(features))
    val cols = NumericCols ++ Seq("o_totalprice") ++ enc.cats.map(c => s"${c}_idx")
    val assembler = new VectorAssembler().setInputCols(cols.toArray).setOutputCol("corr_features")
    val assembled = new Pipeline().setStages(enc.stages :+ (assembler: PipelineStage))
      .fit(features).transform(features)
    val m = Correlation.corr(assembled, "corr_features", "pearson")
      .head().getAs[org.apache.spark.ml.linalg.Matrix](0)
    val spark = features.sparkSession
    import spark.implicits._
    val rows = for {
      i <- 0 until m.numRows
      j <- 0 until m.numCols
    } yield (cols(i), cols(j), math.rint(m(i, j) * 1e6) / 1e6)
    rows.toDF("feature_i", "feature_j", "corr")
      .orderBy(col("feature_i"), col("feature_j"))
  }

  /** M1-M4: regression pipeline (indexers → one-hot → assembler → LR),
    * label = o_totalprice. Returns (model, rmse-on-test). */
  def regression(features: DataFrame, enc0: FittedEncoders = null): (PipelineModel, Double) = {
    val enc = Option(enc0).getOrElse(fitEncoders(features))
    val assembler = new VectorAssembler()
      .setInputCols(enc.vecCols ++ NumericCols).setOutputCol("features")
    val lr = new LinearRegression().setFeaturesCol("features").setLabelCol("o_totalprice")
    val pipeline = new Pipeline().setStages(enc.stages ++ Array[PipelineStage](assembler, lr))
    val Array(train, test) = features.randomSplit(Array(0.8, 0.2), seed = 42)
    val model = pipeline.fit(train)
    val rmse = new RegressionEvaluator()
      .setLabelCol("o_totalprice").setPredictionCol("prediction").setMetricName("rmse")
      .evaluate(model.transform(test))
    (model, rmse)
  }

  /** Hyperparameter sweep — the TrainValidationSplit shape made
    * auditable: a FIXED (regParam × elasticNetParam) grid fit on the
    * seeded 80/20 split, each candidate scored by validation RMSE,
    * emitted as one report row per candidate with the winner flagged
    * (deterministic tie-break: rmse, then the params). The grid loop
    * lives on the driver but each fit/evaluate is a distributed job —
    * exactly how TrainValidationSplit schedules it, with the per-
    * candidate metrics kept instead of discarded (the report IS the
    * point: a training pipeline logs the sweep, not just the winner).
    * Seeded ⇒ rows-only + MLSpec (winner minimality, determinism). */
  def paramSweep(features: DataFrame, enc0: FittedEncoders = null): DataFrame = {
    val spark = features.sparkSession
    import spark.implicits._
    val enc = Option(enc0).getOrElse(fitEncoders(features))
    val assembler = new VectorAssembler()
      .setInputCols(enc.vecCols ++ NumericCols).setOutputCol("features")
    val Array(train, valid) = features.randomSplit(Array(0.8, 0.2), seed = 42)
    val eval = new RegressionEvaluator()
      .setLabelCol("o_totalprice").setPredictionCol("prediction").setMetricName("rmse")
    val grid = for { rp <- Seq(0.0, 0.5); en <- Seq(0.0, 0.5) } yield (rp, en)
    val scored = grid.map { case (rp, en) =>
      val lr = new LinearRegression()
        .setFeaturesCol("features").setLabelCol("o_totalprice")
        .setRegParam(rp).setElasticNetParam(en)
      val model = new Pipeline()
        .setStages(enc.stages ++ Array[PipelineStage](assembler, lr)).fit(train)
      (rp, en, eval.evaluate(model.transform(valid)))
    }
    val best = scored.minBy { case (rp, en, rmse) => (rmse, rp, en) }
    scored.toDF("reg_param", "elastic_net", "rmse")
      .withColumn("is_best",
        (col("reg_param") === best._1 && col("elastic_net") === best._2).cast("long"))
      .orderBy(col("reg_param"), col("elastic_net"))
  }

  /** M5: binary classification — label from the approx-median split
    * (relErr 0.001), LogisticRegression maxIter=20.
    * Returns (model, threshold, auc). */
  def classification(features: DataFrame, enc0: FittedEncoders = null): (PipelineModel, Double, Double) = {
    val enc = Option(enc0).getOrElse(fitEncoders(features))
    val Array(median) = features.stat.approxQuantile("o_totalprice", Array(0.5), 0.001)
    val labeled = features.withColumn("label",
      when(col("o_totalprice") > lit(median), 1.0).otherwise(0.0))
    val assembler = new VectorAssembler()
      .setInputCols(enc.vecCols ++ NumericCols).setOutputCol("features")
    val logreg = new LogisticRegression().setMaxIter(20)
      .setFeaturesCol("features").setLabelCol("label")
    val pipeline = new Pipeline().setStages(enc.stages ++ Array[PipelineStage](assembler, logreg))
    val Array(train, test) = labeled.randomSplit(Array(0.8, 0.2), seed = 42)
    val model = pipeline.fit(train)
    val auc = new BinaryClassificationEvaluator()
      .setLabelCol("label").setRawPredictionCol("rawPrediction")
      .setMetricName("areaUnderROC")
      .evaluate(model.transform(test))
    (model, median, auc)
  }

  /** M6: KMeans k=5 seed=42 over one-hot + numeric + amount features
    * (app/machine_learning_models.py:251-258). */
  def clustering(features: DataFrame, k: Int = 5, enc0: FittedEncoders = null): PipelineModel = {
    val enc = Option(enc0).getOrElse(fitEncoders(features))
    val assembler = new VectorAssembler()
      .setInputCols(enc.vecCols ++ NumericCols :+ "o_totalprice")
      .setOutputCol("features")
    val km = new KMeans().setK(k).setSeed(42).setFeaturesCol("features")
    new Pipeline().setStages(enc.stages ++ Array[PipelineStage](assembler, km)).fit(features)
  }

  /** PCA over the embedding table — the dimensionality probe an
    * embedding pipeline runs before ANN indexing or whitening: fit
    * k principal components over the corpus vectors and report each
    * component's explained-variance ratio (how much of the space the
    * head directions carry — the number that justifies an IVF/OPQ
    * dimension budget). Deterministic up to eigensolver convergence,
    * but not SQL-expressible ⇒ rows-only + MLSpec (ratios descend,
    * sum ≤ 1). Fit is covariance-matrix-sized (dim², distributed
    * Gram accumulation) — corpus size only affects the one pass. */
  def pcaVarianceReport(embeddings: DataFrame, k: Int = 4): DataFrame = {
    import org.apache.spark.ml.feature.PCA
    import org.apache.spark.ml.functions.array_to_vector
    val spark = embeddings.sparkSession
    import spark.implicits._
    val vecs = embeddings.select(
      array_to_vector(col("embedding").cast("array<double>")).as("features"))
    val model = new PCA().setInputCol("features").setOutputCol("pca").setK(k).fit(vecs)
    model.explainedVariance.toArray.toSeq.zipWithIndex
      .map { case (v, i) => (i.toLong, math.rint(v * 1e9) / 1e9) }
      .toDF("component", "explained_variance")
      .orderBy(col("component"))
  }

  /** Single-row inference (the reference's Flask POST path, §3.3):
    * unseen categories → handleInvalid=skip drops the row → caller
    * must handle the empty frame. */
  def predictOne(spark: SparkSession, model: PipelineModel,
                 priority: String, status: String, segment: String,
                 monthV: Int, yearV: Int): DataFrame = {
    import spark.implicits._
    val in = Seq((0L, 0.0, monthV, yearV, priority, status, segment))
      .toDF("o_orderkey", "o_totalprice", "o_month", "o_year",
            "o_orderpriority", "o_orderstatus", "c_mktsegment")
    model.transform(in)
  }

  /** S9: engine-level model persistence. The reference trains offline
    * and loads saved PipelineModels at serving startup
    * (app/ml_app.py:68-74); artifact layout is Spark ML's native one —
    * `<path>/metadata/part-00000` (JSON with the stageUids list, as in
    * the reference's outputs/pipeline_regression/metadata/part-00000)
    * plus one `<path>/stages/<i>_<uid>/` dir per fitted stage.
    * Round-trip equality is asserted in MLSpec; the serving-path
    * save→load→infer composition is catalog-visible as q65. */
  def saveModel(model: PipelineModel, path: String): Unit =
    model.write.overwrite().save(path)

  def loadModel(path: String): PipelineModel = PipelineModel.load(path)

  /** Classification inference with probability extraction — the
    * reference's serving-path label + confidence (app/ml_app.py:282-287:
    * label = HIGH iff prediction==1, confidence = probability[label]·100,
    * rounded to 2 decimals). `probability` is a VectorUDT; element
    * extraction goes through ml.functions.vector_to_array (1-based
    * element_at). */
  def withConfidence(predictions: DataFrame): DataFrame =
    predictions
      .withColumn("pred_label",
        when(col("prediction") === 1.0, lit("HIGH")).otherwise(lit("LOW")))
      .withColumn("confidence",
        round(element_at(vector_to_array(col("probability")),
                         col("prediction").cast("int") + 1) * 100, 2))
}
