package graft.canon

import graft.SparkSpec
import graft.oracle.SeedRequest
import org.apache.spark.sql.functions._

/** C6 object-id generation (reference crypto.py:21-24) + the custom
  * unique-key surface it interacts with (_request.py:258-311).
  */
class IdsSpec extends SparkSpec {

  test("random ids: 17 chars from the reference alphabet, unique in practice") {
    val ids = (0 until 5000).map(_ => Ids.randomObjectId())
    assert(ids.forall(_.length == 17))
    assert(ids.forall(_.forall(Ids.Alphabet.contains(_))))
    // 62^17 key space — any collision in 5000 draws means a broken RNG
    assert(ids.distinct.size == ids.size)
    assert(Ids.randomObjectId(32).length == 32)
  }

  test("deterministic ids: stable, alphabet-constrained, length-capped") {
    val a = Ids.deterministicObjectId("seed-1")
    assert(a == Ids.deterministicObjectId("seed-1"))
    assert(a != Ids.deterministicObjectId("seed-2"))
    assert(a.length == 17 && a.forall(Ids.Alphabet.contains(_)))
    assert(Ids.deterministicObjectId("seed-1", 32).startsWith(a))
    intercept[IllegalArgumentException](Ids.deterministicObjectId("s", 33))
  }

  test("column form agrees bit-for-bit with the Scala form") {
    import spark.implicits._
    val seeds = (0 until 200).map(i => s"id-$i")
    val got = seeds.toDF("seed")
      .select(col("seed"), Ids.deterministicObjectIdCol(col("seed")).as("oid"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    seeds.foreach(s => assert(got(s) == Ids.deterministicObjectId(s), s"mismatch for $s"))
  }

  test("custom unique_key + always_enqueue is a construction error (_request.py:291-292)") {
    intercept[IllegalArgumentException](
      SeedRequest("https://a.example.com/", alwaysEnqueue = true, uniqueKeyOverride = Some("k")))
    // custom key alone overrides the computed C2 key verbatim
    assert(SeedRequest("https://a.example.com/", uniqueKeyOverride = Some("custom-k")).uniqueKey == "custom-k")
  }
}
