package graft

import org.apache.spark.sql.functions._

/** Guards the scaling harness itself: the inflation model's contracts
  * (exact row multiplication, disjoint id spaces, disjoint
  * cross-replica gram vocabularies — the property that keeps candidate
  * growth linear) and that every family kernel still runs end-to-end
  * at a small factor. Without this, ScaleBench only compiles when
  * someone remembers to run it.
  */
class ScaleBenchSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  test("inflate multiplies rows exactly with disjoint id spaces") {
    val dir = ScaleBench.inflate(spark, sf, 3)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val events = spark.read.parquet(s"$dir/events.parquet")
    val baseDocs = graft.tables.Tables.documents(spark, sf).count()
    val baseEvents = graft.tables.Tables.events(spark, sf).count()
    assert(docs.count() === 3 * baseDocs)
    assert(events.count() === 3 * baseEvents)
    // replica id spaces never collide
    assert(docs.select("doc_id").distinct().count() === 3 * baseDocs)
    assert(events.select("event_id").distinct().count() ===
      3 * baseEvents)
    // replicas share NO 3-grams with the base (the property that keeps
    // candidate structure linear under inflation)
    val grams = docs.select(
      (col("doc_id") / 10000000L).cast("long").as("rep"),
      explode(graft.functions.TextFunctions
        .md5GramSet64Udf(col("text"), lit(3))).as("g"))
    val crossRep = grams.groupBy("g")
      .agg(countDistinct(col("rep")).as("nrep"))
      .filter(col("nrep") > 1)
    assert(crossRep.count() === 0,
      "a 3-gram appears in more than one replica")
  }

  test("gram disjointness holds at a two-digit factor") {
    // the pre-v2 bare r<k> prefix was not prefix-free: replica 1 +
    // digit-leading token ("r1"+"1foo") collided with replica 11
    // ("r11"+"foo"). Factor 12 exercises exactly the two-digit regime
    // where that broke; fixed-width r%03d is prefix-free for k<1000.
    val dir = ScaleBench.inflate(spark, sf, 12)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val grams = docs.select(
      (col("doc_id") / 10000000L).cast("long").as("rep"),
      explode(graft.functions.TextFunctions
        .md5GramSet64Udf(col("text"), lit(3))).as("g"))
    val crossRep = grams.groupBy("g")
      .agg(countDistinct(col("rep")).as("nrep"))
      .filter(col("nrep") > 1)
    assert(crossRep.count() === 0,
      "a 3-gram appears in more than one replica at factor 12")
    // stored n_chars must describe the stored (rewritten) text —
    // ADVICE r8: it previously measured the INPUT text for every k>0
    val bad = docs.filter(length(col("text")).cast("long")
      =!= col("n_chars")).count()
    assert(bad === 0, s"$bad rows with n_chars != length(text)")
  }

  test("every family kernel runs end-to-end at factor 2") {
    val dir = ScaleBench.inflate(spark, sf, 2)
    for (fam <- Seq("lsh_dedup", "incr_fold", "ppjoin", "suffix_rank",
        "span_dedup", "hll", "asof", "ann", "etl_merge")) {
      val (rows, _) = ScaleBench.runFamily(spark, fam, dir, 2)
      assert(rows > 0, s"family $fam returned no rows")
    }
  }
}
