package graft

import graft.ops.{Dedup, Sketches}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Mergeable sketches: HLL registers and CMS counters must merge to
  * exactly the global sketch (the incremental-stats contract), the HLL
  * estimate must land inside its error bound on both estimator branches,
  * and CMS must never underestimate. */
class SketchesSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def keys(n: Int, prefix: String = "k") = {
    val sp = spark; import sp.implicits._
    (0 until n).map(i => s"$prefix$i").toDF("key")
  }

  test("HLL: merge of batch sketches == sketch of the union, register-exact") {
    val all = keys(5000)
    val half1 = all.filter(expr("substring(key, 2) % 2 = 0"))
    val half2 = all.filter(expr("substring(key, 2) % 2 = 1"))
    val merged = Sketches.hllMerge(Seq(
      Sketches.hllSketch(half1, "key"), Sketches.hllSketch(half2, "key")))
    val direct = Sketches.hllSketch(all, "key")
    assert(merged.except(direct).isEmpty && direct.except(merged).isEmpty)
  }

  test("HLL: raw-branch estimate within 5% at 20k distinct keys") {
    val est = Sketches.hllEstimate(Sketches.hllSketch(keys(20000), "key"))
      .head()
    val e = est.getDouble(2)
    assert(math.abs(e / 20000.0 - 1.0) < 0.05, s"estimate $e")
  }

  test("HLL: linear-counting branch fires at small n and stays within 5%") {
    val row = Sketches.hllEstimate(Sketches.hllSketch(keys(300), "key")).head()
    val zeros = row.getLong(1)
    assert(zeros > 0)
    val e = row.getDouble(2)
    assert(math.abs(e / 300.0 - 1.0) < 0.05, s"estimate $e")
  }

  test("HLL: duplicate keys do not move the sketch") {
    val sp = spark; import sp.implicits._
    val dup = (0 until 1000).flatMap(i => Seq.fill(3)(s"k$i")).toDF("key")
    val once = Sketches.hllSketch(keys(1000), "key")
    val thrice = Sketches.hllSketch(dup, "key")
    assert(thrice.except(once).isEmpty && once.except(thrice).isEmpty)
  }

  test("HLL: rho matches the hash definition on a literal key") {
    val h = Dedup.md5Lower64("hll:probe")
    val row = Sketches.hllSketch(keys(1).select(lit("probe").as("key")), "key")
      .head()
    assert(row.getLong(0) === (h >>> 52))
    val w = h & ((1L << 52) - 1)
    val expRho =
      if (w == 0L) 53L else (java.lang.Long.numberOfLeadingZeros(w) - 11).toLong
    assert(row.getLong(1) === expRho)
  }

  test("CMS: merge of batch sketches == global counters; row sums conserved") {
    val sp = spark; import sp.implicits._
    val occ = (0 until 3000).map(i => s"t${i % 37}").toDF("key")
    val merged = Sketches.cmsMerge(Seq(
      Sketches.cmsSketch(occ.limit(1500), "key"),
      Sketches.cmsSketch(occ.exceptAll(occ.limit(1500)), "key")))
    val direct = Sketches.cmsSketch(occ, "key")
    assert(merged.except(direct).isEmpty && direct.except(merged).isEmpty)
    // every CMS row sees every occurrence exactly once
    val sums = direct.groupBy("row").agg(sum("cnt").as("s")).collect()
    assert(sums.length === 4 && sums.forall(_.getLong(1) === 3000L))
  }

  test("CMS: estimates never underestimate; exact for isolated keys") {
    val sp = spark; import sp.implicits._
    val occ = (0 until 2000).map(i => s"t${i % 23}").toDF("key")
    val sketch = Sketches.cmsSketch(occ, "key")
    val truth = occ.groupBy("key").agg(count(lit(1)).as("tc"))
    val est = Sketches.cmsEstimate(sketch, truth, "key")
    val joined = est.join(truth, "key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(joined.length === 23)
    assert(joined.forall { case (_, e, t) => e >= t })
    // 23 keys in 4x1024 cells: expect the min over rows to be exact
    assert(joined.forall { case (_, e, t) => e === t })
  }

  test("CMS: missing cells probe as zero counts") {
    val sketch = Sketches.cmsSketch(keys(5), "key")
    val est = Sketches.cmsEstimate(sketch, keys(3, "absent"), "key").collect()
    assert(est.length === 3 && est.forall(_.getLong(1) === 0L))
  }
}
