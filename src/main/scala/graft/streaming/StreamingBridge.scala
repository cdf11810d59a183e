package graft.streaming

import org.apache.spark.sql.DataFrame

/**
 * Static py4j bridge for the streaming surface — the [[graft.Display]]
 * pattern (a plain object with monomorphic methods, because py4j can
 * reach neither Scala default arguments nor `Seq`/tuple parameters):
 * each method forwards to the corresponding [[StreamingPipeline]]
 * operator with every argument explicit and java-friendly
 * (arrays instead of `Seq[(Long, Long)]`, `DataFrame` in/out), so
 * `python/graft/streaming.py` wraps the whole stateful surface as
 * `spark._jvm.graft.streaming.StreamingBridge.<op>(jdf, ...)` with
 * ZERO Python on the hot path — the state machines stay compiled.
 *
 * Mirrors the reference's py4j delegation style
 * (python/pyrasterframes/rasterfunctions.py → RasterFunctions).
 */
object StreamingBridge {

  /** [[StreamingPipeline.driftStream]]; the reference histogram ships
    * as two parallel arrays (values, counts). */
  def driftStream(df: DataFrame, key: String, valueCol: String,
      refValues: Array[Long], refCounts: Array[Long],
      maxBins: Int): DataFrame = {
    // zip would silently truncate to the shorter side, quietly
    // dropping reference-histogram mass — fail loud instead
    require(refValues.length == refCounts.length,
      s"drift_stream: refValues (${refValues.length}) and refCounts " +
        s"(${refCounts.length}) must be the same length")
    StreamingPipeline.driftStream(df, key, valueCol,
      refValues.toSeq.zip(refCounts.toSeq), maxBins).toDF()
  }

  /** [[StreamingPipeline.sprtStream]]. */
  def sprtStream(df: DataFrame, key: String, orderCol: String,
      successCol: String, p0Permille: Int, p1Permille: Int,
      alphaPermille: Int, betaPermille: Int): DataFrame =
    StreamingPipeline.sprtStream(df, key, orderCol, successCol,
      p0Permille, p1Permille, alphaPermille, betaPermille).toDF()

  /** [[StreamingPipeline.ngramNoveltyStream]]. */
  def ngramNoveltyStream(df: DataFrame, idCol: String, textCol: String,
      eventTimeCol: String, n: Int, ttlMicros: Long,
      watermarkDelay: String): DataFrame =
    StreamingPipeline.ngramNoveltyStream(df, idCol, textCol,
      eventTimeCol, n, ttlMicros, watermarkDelay).toDF()

  /** [[StreamingPipeline.trendingTopKStream]]. */
  def trendingTopKStream(df: DataFrame, eventTimeCol: String,
      textCol: String, windowMicros: Long, k: Int, capacity: Int,
      watermarkDelay: String): DataFrame =
    StreamingPipeline.trendingTopKStream(df, eventTimeCol, textCol,
      windowMicros, k, capacity, watermarkDelay).toDF()

  /** [[StreamingPipeline.cusumStream]]. */
  def cusumStream(df: DataFrame, key: String, orderCol: String,
      valueCol: String, ref: Long, slack: Long, threshold: Long): DataFrame =
    StreamingPipeline.cusumStream(df, key, orderCol, valueCol,
      ref, slack, threshold).toDF()

  /** [[StreamingPipeline.pageHinkleyStream]]. */
  def pageHinkleyStream(df: DataFrame, key: String, orderCol: String,
      valueCol: String, deltaMicro: Long, lambdaMicro: Long): DataFrame =
    StreamingPipeline.pageHinkleyStream(df, key, orderCol, valueCol,
      deltaMicro, lambdaMicro).toDF()

  /** [[StreamingPipeline.reservoirStream]]. */
  def reservoirStream(df: DataFrame, key: String, idCol: String,
      k: Int): DataFrame =
    StreamingPipeline.reservoirStream(df, key, idCol, k).toDF()

  /** [[StreamingPipeline.quantileStream]]. */
  def quantileStream(df: DataFrame, key: String, valueCol: String,
      maxBins: Int): DataFrame =
    StreamingPipeline.quantileStream(df, key, valueCol, maxBins).toDF()

  /** [[StreamingPipeline.debounceStream]]. */
  def debounceStream(df: DataFrame, key: String, tsCol: String,
      idCol: String, minGap: Long): DataFrame =
    StreamingPipeline.debounceStream(df, key, tsCol, idCol, minGap).toDF()

  /** [[StreamingPipeline.firstSeenStream]]. */
  def firstSeenStream(df: DataFrame, idCol: String,
      bucketCol: String): DataFrame =
    StreamingPipeline.firstSeenStream(df, idCol, bucketCol).toDF()

  /** [[StreamingPipeline.anomalyStream]]. */
  def anomalyStream(df: DataFrame, key: String, orderCol: String,
      valueCol: String, kNum: Int, kDen: Int): DataFrame =
    StreamingPipeline.anomalyStream(df, key, orderCol, valueCol,
      kNum, kDen).toDF()

  /** [[StreamingPipeline.ewmaStream]]. */
  def ewmaStream(df: DataFrame, key: String, orderCol: String,
      valueCol: String, lags: Int): DataFrame =
    StreamingPipeline.ewmaStream(df, key, orderCol, valueCol, lags).toDF()

  /** [[StreamingPipeline.gapRegularityStream]]. */
  def gapRegularityStream(df: DataFrame, key: String, tsCol: String,
      divisor: Long, kNum: Int, kDen: Int, minGaps: Int): DataFrame =
    StreamingPipeline.gapRegularityStream(df, key, tsCol, divisor,
      kNum, kDen, minGaps).toDF()

  /** [[StreamingPipeline.sessionStats]]. */
  def sessionStats(df: DataFrame, keyCol: String, eventTimeCol: String,
      valueCol: String, gap: String): DataFrame =
    StreamingPipeline.sessionStats(df, keyCol, eventTimeCol, valueCol, gap)

  /** [[StreamingPipeline.psiWindowed]]. */
  def psiWindowed(df: DataFrame, eventTimeCol: String, valueCol: String,
      refBounds: Array[Long], refCounts: Array[Long],
      windowDuration: String, watermarkDelay: String): DataFrame =
    StreamingPipeline.psiWindowed(df, eventTimeCol, valueCol, refBounds,
      refCounts, windowDuration, watermarkDelay)

  /** [[StreamingPipeline.calibrationStream]]. */
  def calibrationStream(df: DataFrame, key: String, pMicroCol: String,
      labelCol: String, bins: Int): DataFrame =
    StreamingPipeline.calibrationStream(df, key, pMicroCol, labelCol,
      bins).toDF()

  /** [[StreamingPipeline.distinctWindowed]]. */
  def distinctWindowed(df: DataFrame, eventTimeCol: String, idCol: String,
      windowDuration: String, m: Int, watermarkDelay: String): DataFrame =
    StreamingPipeline.distinctWindowed(df, eventTimeCol, idCol,
      windowDuration, m, watermarkDelay)
}
