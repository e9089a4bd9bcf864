package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llmops.{ProductQuantization, Similarity}

/** Stage-by-stage timing of the PQ pipeline over a stress fixture —
  * answers "where do the seconds go" when stress_pq moves and the
  * encode/top-k changes don't: quantization scan, encode, ADC search are
  * timed as separate actions. Usage: runMain graft.tools.ProfilePq [sfDir]
  */
object ProfilePq {
  def main(args: Array[String]): Unit = {
    val d = if (args.length > 0) args(0) else "/tmp/stress_sf"
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .appName("graft-profile-pq").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // per-stage attribution: sum of task run times + task count per stage
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        println(f"[stage] id=${i.stageId} tasks=${i.numTasks} " +
          f"runTime=${i.taskMetrics.executorRunTime / 1000.0}%.1fs " +
          f"cpu=${i.taskMetrics.executorCpuTime / 1e9}%.1fs ${i.name.take(60)}")
      }
    })

    def time(tag: String)(df: => DataFrame): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.foreachPartition((_: Iterator[org.apache.spark.sql.Row]) => ())
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile-pq] $tag: ${ts.map(t => f"$t%.1f").mkString(", ")} s")
    }

    val emb = graft.model.Tables.embeddings(spark, d)
    time("scan")(emb)
    val q = Similarity.quantizeInt8(emb, "embedding")
      .select(col("vec_id"), col("qvec").cast("array<double>").as("qv"))
    time("quantize")(q)
    val books = ProductQuantization.subspaceCodebooks(
      q.filter(col("vec_id") < 8), "vec_id", "qv", m = 4, dim = 64)
    val encoded = ProductQuantization.pqEncode(
      q.filter(col("vec_id") >= 8), "vec_id", "qv", books, m = 4, dim = 64)
    time("quantize+encode")(encoded)
    // decompose the search: pair scoring alone (sum forces the score
    // column, no top-k machinery) vs the full ADC top-k
    val queries = q.filter(col("vec_id") >= 8 && col("vec_id") < 72)
    val scoredOnly = {
      // mirror adcTopK's internals up to the score column
      val enc2 = encoded.select(col("vec_id").as("cand_id"), col("codes"))
      val lutQ = queries.select(col("vec_id").as("query_id"), col("qv").as("_qv"))
      ProductQuantization.debugScored(lutQ, enc2, books, m = 4, dim = 64)
        .groupBy("query_id").agg(sum("score").as("s"))
    }
    // time("join+score only")(scoredOnly)
    val scoredEqui = {
      val enc2 = encoded.select(col("vec_id").as("cand_id"), col("codes"))
      val lutQ = queries.select(col("vec_id").as("query_id"), col("qv").as("_qv"))
      ProductQuantization.debugScoredEqui(lutQ, enc2, books, m = 4, dim = 64)
        .groupBy("query_id").agg(sum("score").as("s"))
    }
    // time("join+score equi-key")(scoredEqui)
    // bisect: same join, no LUT carried, trivial score — measures the
    // bare pair loop; then LUT carried but a single lookup
    val enc2 = encoded.select(col("vec_id").as("cand_id"), col("codes"))
    val bare = broadcast(queries.select(col("vec_id").as("query_id")))
      .join(enc2, col("query_id") =!= col("cand_id"))
      .groupBy("query_id").agg(sum(element_at(col("codes"), 1)).as("s"))
    // time("join bare (no lut)")(bare)
    // if the bare join is slow because `codes` re-evaluates per PAIR,
    // a materialized encode table must collapse the cost
    val encMat = enc2.localCheckpoint()
    val bareMat = broadcast(queries.select(col("vec_id").as("query_id")))
      .join(encMat, col("query_id") =!= col("cand_id"))
      .groupBy("query_id").agg(sum(element_at(col("codes"), 1)).as("s"))
    time("join bare (materialized codes)")(bareMat)
    // in-plan encode behind the EvalBarrier + bare join + sum — isolates
    // whether the barrier alone reaches the materialized-join floor
    val bareBarrier = {
      val enc2b = graft.operators.EvalBarrier(enc2, "codes")
      broadcast(queries.select(col("vec_id").as("query_id")))
        .join(enc2b, col("query_id") =!= col("cand_id"))
        .groupBy("query_id").agg(sum(element_at(col("codes"), 1)).as("s"))
    }
    time("join bare + barrier")(bareBarrier)
    println("==== bareBarrier metrics ====")
    val finalPlan = bareBarrier.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    finalPlan.foreach { p =>
      val ms = p.metrics.map { case (k, m) => s"$k=${m.value}" }.mkString(", ")
      println(s"[metrics] ${p.nodeName}: $ms")
    }
    // isolate the top-k aggregation: same materialized codes, full ADC
    time("adc on materialized codes")(ProductQuantization.adcTopK(
      queries = queries,
      encoded = encMat.withColumnRenamed("cand_id", "vec_id"),
      codebooks = books,
      idCol = "vec_id", vecCol = "qv", k = 5, m = 4, dim = 64))
    time("full adc")(ProductQuantization.adcTopK(
      queries = queries,
      encoded = encoded, codebooks = books,
      idCol = "vec_id", vecCol = "qv", k = 5, m = 4, dim = 64))
    spark.stop()
  }
}
