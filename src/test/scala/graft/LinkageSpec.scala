package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Linkage

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private val reg = Seq(
    (1L, "john smith", "boston"),
    (2L, "john smith", "boston"),   // 1 edit from 1: same entity
    (3L, "jane smith", "boston"),   // blocks with 1 (city), verify rejects
    (4L, "mary jones", "austin"),
    (5L, "mary jones", "dallas"),   // exact name, different city:
                                    // blocked via the NAME key
    (6L, null, "boston")            // null name never blocks on name
  ).toDF("rid", "name", "city")

  private val keys = Seq(col("name"), col("city"))

  test("OR-blocking candidates: any shared key, null keys inert") {
    val cands = Linkage.candidates(reg, "rid", keys)
      .as[(Long, Long)].collect().toSet
    // boston block: (1,2),(1,3),(2,3),(1,6)... null name row still
    // blocks via city
    assert(cands.contains((1L, 2L)) && cands.contains((1L, 3L)))
    assert(cands.contains((1L, 6L)))
    // name block links the cross-city exact pair
    assert(cands.contains((4L, 5L)))
    // no key shared
    assert(!cands.contains((3L, 4L)))
  }

  test("verify keeps 1-edit and exact pairs, rejects the rest") {
    val links = Linkage.linkPairs(reg, "rid", "name", keys, maxDist = 1)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(links == Set((1L, 2L), (4L, 5L)))
  }

  test("entities: linked records share min-id entity, others are singletons") {
    val ent = Linkage.entities(reg, "rid", "name", keys, maxDist = 1)
      .as[(Long, Long)].collect().toMap
    assert(ent(1L) == 1L && ent(2L) == 1L)
    assert(ent(4L) == 4L && ent(5L) == 4L)
    assert(ent(3L) == 3L && ent(6L) == 6L)
  }

  test("maxBucket drops degenerate blocking keys") {
    val many = (1L to 50L).map(i => (i, s"name-$i", "same-city"))
      .toDF("rid", "name", "city")
    val capped = Linkage.candidates(many, "rid",
      Seq(col("city")), maxBucket = 10)
    assert(capped.count() == 0)
    val uncapped = Linkage.candidates(many, "rid",
      Seq(col("city")), maxBucket = 100)
    assert(uncapped.count() == 50L * 49 / 2)
  }

  test("cross-key values never collide: same string under different keys") {
    val df = Seq((1L, "x", "y"), (2L, "y", "z")).toDF("rid", "a", "b")
    // row1.b = "y" = row2.a, but they are different key families
    assert(Linkage.candidates(df, "rid",
      Seq(col("a"), col("b"))).count() == 0)
  }
}
