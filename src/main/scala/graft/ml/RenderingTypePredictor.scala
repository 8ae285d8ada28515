package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Rendering-type predictor — a dataflow port of the reference's only
  * ML operator (crawlers/_adaptive_playwright/_rendering_type_predictor.py
  * :117-247): per-URL features = mean component-similarity to previously
  * DETECTED urls of each class, scored by a 2-feature logistic regression
  * seeded with the corner points (0,1)→client / (1,0)→static; uncommon
  * labels get a decaying detection-probability boost (coeff n+2=5 → 1).
  *
  * Substitution (documented): sklearn's lbfgs LR is replaced by a
  * deterministic batch-gradient-descent fit of the same model family —
  * the reference tests pin PREDICTIONS and the coefficient schedule, not
  * sklearn's numeric weights, and those behavioral pins are reproduced in
  * PredictorSpec.
  *
  * Spark-first scoring: `scoreDataFrame` evaluates the trained model over
  * a DataFrame of candidate URLs — stored detections ride a broadcast
  * join keyed by label, features aggregate per candidate, and the
  * sigmoid/route is plain column arithmetic; the corpus never moves to
  * the driver (featurize → score → route, the 10^10-frontier shape).
  */
final class RenderingTypePredictor(
    detectionRatio: Double = 0.1,
    kvs: Option[graft.storage.KeyValueStore] = None,
    persistStateKey: String = "rendering-type-predictor-state"
) {

  import RenderingTypePredictor._

  /** Clamped at construction exactly like the reference
    * (`max(0, min(1, detection_ratio))`, _rendering_type_predictor.py). */
  private val detectionRatioClamped: Double = math.max(0.0, math.min(1.0, detectionRatio))

  /** stored detections: (renderingType, label) -> list of component lists */
  private val stored = mutable.LinkedHashMap.empty[(String, String), mutable.ArrayBuffer[Seq[String]]]
  private val labelCoefficients = mutable.HashMap.empty[String, Double] // default 5.0
  private var weights: Option[(Double, Double, Double)] = None // (wStatic, wClient, bias)

  restore()

  def labelCoefficient(label: String): Double = labelCoefficients.getOrElse(label, InitialCoefficient)

  private def componentsFor(renderingType: String, label: String): Seq[Seq[String]] =
    stored.getOrElse((renderingType, label), Nil).toSeq

  private def meanSimilarity(comps: Seq[String], label: String, renderingType: String): Double = {
    val known = componentsFor(renderingType, label)
    if (known.isEmpty) 0.0
    else known.map(k => UrlSimilarity.urlSimilarity(comps, k)).sum / known.size
  }

  def featureVector(url: String, label: String): (Double, Double) = {
    val comps = UrlSimilarity.urlComponents(url)
    (meanSimilarity(comps, label, Static), meanSimilarity(comps, label, ClientOnly))
  }

  /** predict (reference :177-210): class + detection-probability
    * recommendation (1.0 = no confidence; detectionRatio × labelCoeff
    * otherwise; unreliable when the class probabilities are within 0.1).
    */
  def predict(url: String, label: Option[String] = None): (String, Double) = {
    val lbl = label.getOrElse("")
    weights match {
      case Some((w1, w2, b)) =>
        val (f1, f2) = featureVector(url, lbl)
        val p = sigmoid(w1 * f1 + w2 * f2 + b) // P(static)
        val detection =
          if (math.abs(1 - 2 * p) < SimilarityThreshold) 1.0
          else detectionRatioClamped * labelCoefficient(lbl)
        (if (p >= 0.5) Static else ClientOnly, detection)
      case None => (ClientOnly, 1.0) // no data yet (:209-210)
    }
  }

  /** store_result (:212-226): record the detection, decay the label
    * coefficient toward 1, retrain.
    */
  def storeResult(url: String, renderingType: String, label: Option[String] = None): Unit = {
    require(renderingType == Static || renderingType == ClientOnly, s"bad type $renderingType")
    val lbl = label.getOrElse("")
    stored.getOrElseUpdate((renderingType, lbl), mutable.ArrayBuffer.empty) +=
      UrlSimilarity.urlComponents(url)
    val c = labelCoefficient(lbl)
    if (c > 1) labelCoefficients(lbl) = c - 1
    retrain()
    persist()
  }

  /** _retrain (:228-239): corner seeds + every stored detection, fit LR. */
  private def retrain(): Unit = {
    val xs = mutable.ArrayBuffer[(Double, Double)]((0.0, 1.0), (1.0, 0.0))
    val ys = mutable.ArrayBuffer[Double](0.0, 1.0)
    stored.foreach { case ((rt, lbl), compLists) =>
      val y = if (rt == Static) 1.0 else 0.0
      compLists.foreach { comps =>
        xs += ((meanSimilarity(comps, lbl, Static), meanSimilarity(comps, lbl, ClientOnly)))
        ys += y
      }
    }
    weights = Some(fitLogistic(xs.toSeq, ys.toSeq))
  }

  // ---- persistence (RecoverableState analogue) ----------------------------

  def persist(): Unit = kvs.foreach { k =>
    import graft.util.Json.quote
    val storedJson = stored.toSeq.map { case ((rt, lbl), lists) =>
      val ls = lists.map(l => l.map(quote).mkString("[", ",", "]")).mkString("[", ",", "]")
      s"""{"type":${quote(rt)},"label":${quote(lbl)},"urls":$ls}"""
    }.mkString("[", ",", "]")
    val coeffs = labelCoefficients.toSeq.sortBy(_._1)
      .map { case (l, c) => s"${quote(l)}:$c" }.mkString("{", ",", "}")
    val w = weights.map { case (a, b, c) => s"[$a,$b,$c]" }.getOrElse("null")
    k.setJson(persistStateKey, s"""{"stored":$storedJson,"coefficients":$coeffs,"weights":$w}""")
    k.persist()
  }

  private def restore(): Unit = kvs.foreach { k =>
    k.getJson(persistStateKey).foreach { json =>
      import graft.util.Json
      val root = Json.obj(Json.parse(json))
      root.get("stored").map(Json.arr).getOrElse(Vector.empty).foreach { e =>
        val o = Json.obj(e)
        val key = (Json.str(o("type")), Json.str(o("label")))
        val lists = Json.arr(o("urls")).map(l => Json.arr(l).map(Json.str))
        stored.getOrElseUpdate(key, mutable.ArrayBuffer.empty) ++= lists
      }
      root.get("coefficients").map(Json.obj).getOrElse(Map.empty)
        .foreach { case (l, c) => labelCoefficients(l) = Json.double(c) }
      root.get("weights").filter(_ != null).foreach { w =>
        val a = Json.arr(w)
        weights = Some((Json.double(a(0)), Json.double(a(1)), Json.double(a(2))))
      }
    }
  }

  // ---- Spark batch scoring -------------------------------------------------

  /** Current model snapshot for distributed scoring / oracle export:
    * stored rows (type, label, components) and (wStatic, wClient, bias).
    */
  def storedRows: Seq[(String, String, Seq[String])] =
    stored.toSeq.flatMap { case ((rt, lbl), lists) => lists.map(l => (rt, lbl, l)) }
  def modelWeights: Option[(Double, Double, Double)] = weights
  def coefficientRows: Seq[(String, Double)] = labelCoefficients.toSeq.sortBy(_._1)
  def detectionRatioValue: Double = detectionRatioClamped

  /** Score a DataFrame of candidates: `df(urlCol, labelCol)` →
    * + (f_static, f_client, p_static, rendering_type, detection_prob).
    * Stored detections broadcast-join on label; per-candidate features are
    * one aggregate; the sigmoid/threshold/route is column arithmetic.
    */
  def scoreDataFrame(df: DataFrame, urlCol: String, labelCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (w1, w2, b) = weights.getOrElse((0.0, 0.0, 0.0))
    val hasModel = weights.isDefined
    val storedDf = storedRows.toDF("s_type", "s_label", "s_comps")
    val coeffMap = labelCoefficients.toMap // immutable snapshot hoisted out of the UDF
    val dr = detectionRatioClamped
    val compsUdf = udf { (u: String) => UrlSimilarity.urlComponents(u) }
    val simUdf = udf { (a: Seq[String], bb: Seq[String]) => UrlSimilarity.urlSimilarity(a, bb) }
    val coeffUdf = udf { (lbl: String) =>
      coeffMap.getOrElse(Option(lbl).getOrElse(""), InitialCoefficient)
    }
    val cand = df
      .withColumn("__comps", compsUdf(col(urlCol)))
      .withColumn("__lbl", coalesce(col(labelCol), lit("")))
    val feats = cand
      .join(broadcast(storedDf), cand("__lbl") === col("s_label"), "left")
      .withColumn("__sim", when(col("s_type").isNull, lit(null).cast("double"))
        .otherwise(simUdf(col("__comps"), col("s_comps"))))
      .groupBy((df.columns.map(col) :+ col("__lbl")): _*)
      .agg(
        coalesce(avg(when(col("s_type") === Static, col("__sim"))), lit(0.0)).as("f_static"),
        coalesce(avg(when(col("s_type") === ClientOnly, col("__sim"))), lit(0.0)).as("f_client"))
    val p = lit(1.0) / (lit(1.0) + exp(-(lit(w1) * col("f_static") + lit(w2) * col("f_client") + lit(b))))
    feats
      .withColumn("p_static", if (hasModel) p else lit(null).cast("double"))
      .withColumn("rendering_type",
        if (!hasModel) lit(ClientOnly)
        else when(col("p_static") >= 0.5, lit(Static)).otherwise(lit(ClientOnly)))
      .withColumn("detection_prob",
        if (!hasModel) lit(1.0)
        else when(abs(lit(1.0) - lit(2.0) * col("p_static")) < SimilarityThreshold, lit(1.0))
          .otherwise(lit(dr) * coeffUdf(col("__lbl")))) // reference does not clamp
      .drop("__lbl")
  }
}

object RenderingTypePredictor {

  val Static = "static"
  val ClientOnly = "client only"
  val SimilarityThreshold = 0.1
  val InitialCoefficient = 5.0 // reference n + 2 with n = 3

  def sigmoid(z: Double): Double = 1.0 / (1.0 + math.exp(-z))

  /** Deterministic 2-feature logistic fit (batch gradient descent, small
    * L2): the feature space is [0,1]² with the corner seeds, so any
    * reasonable optimizer lands the same decision boundary the reference's
    * sklearn fit finds (PredictorSpec pins the behavioral contract).
    */
  def fitLogistic(xs: Seq[(Double, Double)], ys: Seq[Double]): (Double, Double, Double) = {
    var w1 = 0.0; var w2 = 0.0; var b = 0.0
    val n = xs.size
    val lr = 0.5
    val l2 = 1e-3
    var it = 0
    while (it < 3000) {
      var g1 = 0.0; var g2 = 0.0; var gb = 0.0
      var i = 0
      while (i < n) {
        val (f1, f2) = xs(i)
        val err = sigmoid(w1 * f1 + w2 * f2 + b) - ys(i)
        g1 += err * f1; g2 += err * f2; gb += err
        i += 1
      }
      w1 -= lr * (g1 / n + l2 * w1)
      w2 -= lr * (g2 / n + l2 * w2)
      b -= lr * gb / n
      it += 1
    }
    (w1, w2, b)
  }

  /** Oracle side-channel: stored detections + weights + coefficients as
    * parquet so the SQL oracle can recompute features (DuckDB has
    * jaro_winkler_similarity) and the sigmoid independently.
    */
  val ExportBase = "/tmp/graft_rtp"

  def exportModel(spark: SparkSession, p: RenderingTypePredictor, tag: String): String = {
    import spark.implicits._
    val dir = s"$ExportBase/$tag"
    p.storedRows.toDF("s_type", "s_label", "s_comps")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/stored")
    val (w1, w2, b) = p.modelWeights.getOrElse((0.0, 0.0, 0.0))
    Seq((w1, w2, b, p.detectionRatioValue)).toDF("w_static", "w_client", "bias", "detection_ratio")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/model")
    // label coefficients (detection-probability decay schedule) — consumers
    // coalesce a missing label to the initial 5.0
    val coeffs = if (p.coefficientRows.nonEmpty) p.coefficientRows else Seq(("", InitialCoefficient))
    coeffs.toDF("c_label", "c_coeff")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/coeffs")
    dir
  }
}
