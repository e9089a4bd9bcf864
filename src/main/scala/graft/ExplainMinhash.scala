package graft
import org.apache.spark.sql.SparkSession
import graft.llmops.Dedup
import graft.model.Tables
object ExplainMinhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().withExtensions(new GraftExtensions)
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val out = Dedup.minhashNearDups(docs, "doc_id", "text", 3, 16, 4, 0.8)
    out.collect() // execute THIS QueryExecution so AQE finalizes the plan
    val plan = out.queryExecution.executedPlan.toString
    println("=== exchanges: " + "Exchange".r.findAllIn(plan).length)
    println("=== reused exchanges: " + "ReusedExchange".r.findAllIn(plan).length)
    println("=== scans of documents: " + "documents.parquet".r.findAllIn(plan).length)
    println("=== minhash sig nodes: " + "graft_minhash_sig".r.findAllIn(plan).length)
    println("=== md5/transform shingle nodes: " + "array_distinct".r.findAllIn(plan).length)
    println(plan.linesIterator.filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Scan")).mkString("\n"))
    spark.stop()
  }
}
