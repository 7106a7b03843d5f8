package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import graft.pipeline._
import scala.collection.mutable
object Profile3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = mutable.ArrayBuffer[(Int,String,Int,Long,Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        stages += ((si.stageId, si.name.split("\n")(0).take(80), si.numTasks, dur, si.taskMetrics.executorRunTime))
      }
    })
    val kb = Corpus.kb(spark)
    val pages = Corpus.pages(spark, 400000L, 128)
    // warm
    locally { val (tw,nw,ew) = Pipeline.graphCheckpointed(pages, kb, "/tmp/p3/wk"); tw.count(); nw.write.mode("overwrite").parquet("/tmp/p3/n"); ew.write.mode("overwrite").parquet("/tmp/p3/e"); tw.unpersist() }
    stages.clear()
    val t0=System.nanoTime()
    val (t,n,e) = Pipeline.graphCheckpointed(pages, kb, "/tmp/p3/wk"); t.count()
    n.write.mode("overwrite").parquet("/tmp/p3/n"); e.write.mode("overwrite").parquet("/tmp/p3/e")
    t.unpersist()
    println(f"[p3] measured total ${(System.nanoTime()-t0)/1e9}%.2f s")
    Thread.sleep(500)
    println("[p3] stageId | tasks | wallMs | taskTimeMs | name")
    stages.sortBy(-_._4).take(40).foreach { case (id,name,nt,dur,rt) =>
      println(f"[p3] $id%6d | $nt%5d | $dur%7d | $rt%9d | $name")
    }
    spark.stop()
  }
}
