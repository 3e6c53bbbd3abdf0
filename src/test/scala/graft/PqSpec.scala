package graft

import graft.ops.Pq
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Product quantization: codes are a pure function of the vector, the
  * ADC distance is the distance to the reconstruction, and the scan
  * ranks by it — so planted duplicates of the query are unbeatable. */
class PqSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select("vec_id", "embedding")
  private def queryVec = emb.orderBy("vec_id").select("embedding").head
    .getSeq[Float](0).toArray

  test("codes: m bytes per vector, identical vectors encode identically") {
    import org.apache.spark.sql.functions._
    val model = Pq.train(emb, m = 8, k = 16)
    assert(model.dsub * model.m === 64)
    val planted = emb.select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    val codes = Pq.encode(emb.unionByName(planted), model).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(codes.values.forall(_.length === 8))
    emb.select("vec_id").collect().map(_.getLong(0)).foreach { id =>
      assert(codes(id).toSeq === codes(id + 100000).toSeq, s"vec $id")
    }
  }

  test("ADC distance == distance to the decoded vector (1e-9 relative)") {
    val model = Pq.train(emb, m = 8, k = 16)
    val q = queryVec
    val codes = Pq.encode(emb, model)
    val adc = Pq.adcTopK(codes, model, q, 500).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val byId = codes.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(adc.size === byId.size) // k=500 == table size: every row ranked
    adc.foreach { case (id, d) =>
      val exact = Pq.exactDistToDecoded(q, byId(id), model)
      assert(math.abs(d - exact) <= 1e-9 * math.max(1.0, exact), s"vec $id: $d vs $exact")
    }
  }

  test("planted duplicates of the query are the unbeatable top hits") {
    import org.apache.spark.sql.functions._
    val model = Pq.train(emb, m = 8, k = 16)
    val q = queryVec
    // plant 3 exact copies of the query under fresh ids: their codes equal
    // the query vector's own code, so their ADC distance is the minimum
    // any vector with that code can have — all 3 must rank in the top 4
    // together with the original (vec_id 0 is the query source)
    val dup = emb.filter(col("vec_id") === 0)
    val planted = (1 to 3).map(i =>
      dup.select((col("vec_id") + 200000 + i).as("vec_id"), col("embedding")))
      .reduce(_ unionByName _)
    val codes = Pq.encode(emb.unionByName(planted), model)
    val all = Pq.adcTopK(codes, model, q, 1000).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val minD = all.values.min
    // unbeatable, not necessarily exclusive: another vector may share the
    // full code (k=16^8 cells but similar vectors collapse) and tie
    assert(all(0L) === minD)
    (1 to 3).foreach(i => assert(all(200000L + i) === minD))
  }

  test("recall vs exact: ADC top-50 overlaps the true top-50 on the driver table") {
    val model = Pq.train(emb, m = 16, k = 64)
    val q = queryVec
    val codes = Pq.encode(emb, model)
    val adcIds = Pq.adcTopK(codes, model, q, 50).collect().map(_.getLong(0)).toSet
    val bruteIds = graft.ops.Similarity.bruteForceTopK(emb, q, 50)
      .collect().map(_.getLong(0)).toSet
    val recall = (adcIds & bruteIds).size / 50.0
    // deterministic data + deterministic training: a fixed reading with
    // margin (measured 0.74 at m=16,k=64 on sf0.001)
    info(s"measured recall: $recall")
    assert(recall >= 0.4, s"recall $recall")
  }

  test("refined ADC: exact cosines on the shortlist, recall lifted to ~1") {
    val model = Pq.train(emb, m = 16, k = 64)
    val q = queryVec
    val codes = Pq.encode(emb, model)
    val refined = Pq.adcTopKRefined(codes, emb, model, q, 50).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(refined.length === 50)
    // descending, and every emitted cosine is the EXACT cosine (the
    // refine step recomputes on raw vectors — PQ only shortlists)
    assert(refined.sliding(2).forall(w => w(0)._2 >= w(1)._2))
    val bruteAll = graft.ops.Similarity.bruteForceTopK(emb, q, 500).collect()
      .map(r => r.getLong(0) -> r.getDouble(r.fieldIndex("cosine"))).toMap
    refined.foreach { case (id, c) => assert(c === bruteAll(id), s"vec $id") }
    val bruteTop = graft.ops.Similarity.bruteForceTopK(emb, q, 50)
      .collect().map(_.getLong(0)).toSet
    val recall = refined.map(_._1).count(bruteTop.contains) / 50.0
    assert(recall >= 0.9, s"refined recall $recall") // measured 0.98
  }

  test("dim not divisible by m / oversized k are rejected") {
    intercept[IllegalArgumentException](Pq.train(emb, m = 7))
    intercept[IllegalArgumentException](Pq.train(emb, m = 8, k = 300))
  }
}
