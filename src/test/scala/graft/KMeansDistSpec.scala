package graft

import graft.ops.KMeansDist
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Distributed Lloyd's: assignment map-side, update as one (cell, dim)
  * keyed exchange, model collected bounded by k*dim. */
class KMeansDistSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Three well-separated 4-dim blobs, 30 points each, small jitter. */
  private def blobs(partitions: Int = 4) = {
    val s = spark
    import s.implicits._
    val anchors = Seq(
      Array(10f, 0f, 0f, 0f), Array(0f, 10f, 0f, 0f), Array(0f, 0f, 10f, 0f))
    val rnd = new scala.util.Random(7)
    val rows = for (b <- 0 until 3; i <- 0 until 30) yield {
      val v = anchors(b).map(_ + (rnd.nextFloat() - 0.5f) * 0.2f)
      ((b * 30 + i).toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding").repartition(partitions)
  }

  test("separable blobs converge to the anchor centroids") {
    val centers = KMeansDist.train(blobs(), k = 3, iters = 5)
    assert(centers.length === 3)
    // each anchor must be within jitter radius of exactly one centroid
    val anchors = Seq(Array(10.0, 0, 0, 0), Array(0.0, 10, 0, 0), Array(0.0, 0, 10, 0))
    anchors.foreach { a =>
      val near = centers.count(c =>
        math.sqrt(c.zip(a).map { case (x, y) => (x - y) * (x - y) }.sum) < 0.5)
      assert(near === 1, s"anchor ${a.toSeq}")
    }
  }

  test("update shuffles only (cell, dim) partials: model size bounded by k*dim") {
    // not a plan assertion — a behavioral proxy: training runs on a frame
    // 100x the model without collecting it (collect would OOM nothing at
    // this scale, but the API returns only k arrays of dim doubles)
    val centers = KMeansDist.train(blobs(8), k = 3, iters = 2)
    assert(centers.forall(_.length === 4))
  }

  test("k exceeding distinct points: surplus centroids keep their init, no crash") {
    val s = spark
    import s.implicits._
    val two = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)), (3L, Seq(1f, 0f)))
      .toDF("vec_id", "embedding")
    val centers = KMeansDist.train(two, k = 3, iters = 3)
    assert(centers.length === 3)
    assert(centers.forall(c => c.forall(x => !x.isNaN)))
  }

  test("custom column names") {
    val df = blobs().withColumnRenamed("vec_id", "id").withColumnRenamed("embedding", "e")
    val centers = KMeansDist.train(df, k = 3, iters = 3, idCol = "id", embCol = "e")
    assert(centers.length === 3)
  }
}
