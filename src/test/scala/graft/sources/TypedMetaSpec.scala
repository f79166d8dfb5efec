package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Python-`==` typed metadata semantics (reference tests/demo.py:219-238:
  * priority stored as int, filtered as int).
  */
class TypedMetaSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val rows = Seq(
    // (id, priority int, flag bool, label string, score double)
    (1L, 1, true, "1", 1.5),
    (2L, 0, false, "a", 2.0),
    (3L, 2, true, "true", 1.0))
    .toDF("id", "priority", "flag", "label", "score")
    .select($"id", TypedMeta.metaColumn(
      "priority" -> $"priority",
      "flag" -> $"flag",
      "label" -> $"label",
      "score" -> $"score").as("meta"))
    .cache()

  private def ids(filter: Map[String, Any]): Set[Long] =
    rows.filter(TypedMeta.typedPredicate($"meta", filter))
      .select($"id").collect().map(_.getLong(0)).toSet

  test("int filter matches ints, never the equal-looking string") {
    assert(ids(Map("priority" -> 1)) == Set(1L))
    // label "1" is a STRING — int 1 must not match it (Python: "1" != 1)
    assert(ids(Map("label" -> 1)) == Set.empty[Long])
    // and string "1" must not match int priority 1
    assert(ids(Map("priority" -> "1")) == Set.empty[Long])
  }

  test("string filter matches only strings") {
    assert(ids(Map("label" -> "1")) == Set(1L))
    assert(ids(Map("label" -> "a")) == Set(2L))
    // "true" the STRING is not True the bool (Python: "true" != True)
    assert(ids(Map("label" -> "true")) == Set(3L))
    assert(ids(Map("flag" -> "true")) == Set.empty[Long])
  }

  test("Python bool-is-int: True == 1, False == 0, 1.0 == 1") {
    assert(ids(Map("flag" -> true)) == Set(1L, 3L))
    assert(ids(Map("flag" -> 1)) == Set(1L, 3L))     // True == 1
    assert(ids(Map("flag" -> 0)) == Set(2L))          // False == 0
    assert(ids(Map("priority" -> true)) == Set(1L))   // 1 == True
    assert(ids(Map("priority" -> 1.0)) == Set(1L))    // 1 == 1.0
    assert(ids(Map("score" -> 1)) == Set(3L))         // 1.0 == 1
  }

  test("conjunction and absent keys") {
    assert(ids(Map("priority" -> 1, "flag" -> true)) == Set(1L))
    assert(ids(Map("priority" -> 1, "flag" -> false)) == Set.empty[Long])
    assert(ids(Map("missing" -> 1)) == Set.empty[Long])
  }

  test("float filter matches a stored float of the same value") {
    val fdf = Seq((1L, 0.1f), (2L, 0.25f)).toDF("id", "score")
      .select($"id", TypedMeta.metaColumn("score" -> $"score").as("meta"))
    def got(v: Any): Set[Long] =
      fdf.filter(TypedMeta.typedEquals($"meta", "score", v))
        .select($"id").collect().map(_.getLong(0)).toSet
    assert(got(0.1f) == Set(1L), "0.1f must match its own stored value")
    assert(got(0.25f) == Set(2L))
    assert(got(0.25) == Set(2L), "dyadic double matches the float")
  }

  test("longs beyond 2^53 compare exactly, not through doubles") {
    val big = 9007199254740993L // 2^53 + 1
    val bdf = Seq((1L, big), (2L, big - 1)).toDF("id", "v")
      .select($"id", TypedMeta.metaColumn("v" -> $"v").as("meta"))
    def got(v: Long): Set[Long] =
      bdf.filter(TypedMeta.typedEquals($"meta", "v", v))
        .select($"id").collect().map(_.getLong(0)).toSet
    assert(got(big) == Set(1L), "2^53+1 must match only itself")
    assert(got(big - 1) == Set(2L), "adjacent longs must not collide via double")
  }

  test("string-filter API (metadataPredicate) matches typed-encoded stores") {
    import graft.operators.Knn
    val df = Seq((1L, "image"), (2L, "audio")).toDF("id", "kind")
      .select($"id", TypedMeta.metaColumn("kind" -> $"kind").as("meta"))
    val hit = df.filter(Knn.metadataPredicate($"meta", Map("kind" -> "image")))
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(hit == Set(1L))
    // and still matches legacy raw maps
    val legacy = Seq((3L, Map("kind" -> "image"))).toDF("id", "meta")
    assert(legacy.filter(Knn.metadataPredicate($"meta", Map("kind" -> "image")))
      .count() == 1)
  }

  test("legacy raw string maps still match string filters") {
    val legacy = Seq((1L, Map("category" -> "A")), (2L, Map("category" -> "B")))
      .toDF("id", "meta")
    val got = legacy.filter(TypedMeta.typedEquals($"meta", "category", "A"))
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L))
  }

  test("catalog round trip: typed ingest, typed query, demo semantics") {
    // mirror the reference demo corpus: priority = i % 3 (int), lang de/en
    val cat = new VectorStoreCatalog(spark,
      java.nio.file.Files.createTempDirectory("graft_typed").toString)
    cat.create("u", "typed", StoreConfig(dimension = 4))
    val rnd = new scala.util.Random(5)
    val src = (0 until 20).map { i =>
      (Seq.fill(4)(rnd.nextFloat()), i % 3, if (i % 2 == 0) "de" else "en")
    }.toDF("vector", "priority", "lang")
      .select($"vector", TypedMeta.metaColumn(
        "priority" -> $"priority", "lang" -> $"lang").as("meta"))
    cat.addVectors("u", "typed", src)

    val q = Seq.fill(4)(0.5)
    val hits = cat.queryTyped("u", "typed", q, 10,
      Map("priority" -> 1, "lang" -> "en"))
    val metas = hits.select($"meta").collect().map(_.getMap[String, String](0))
    // ids 1,7,13,19 have priority 1 AND lang en
    assert(metas.length == 4)
    assert(metas.forall(m => m("priority") == "1" && m("lang") == "\"en\""))
    // typed discrimination end-to-end: string "1" finds nothing
    assert(cat.queryTyped("u", "typed", q, 10, Map("priority" -> "1")).count() == 0)
    // non-existent value: empty, no error (demo's category "C" case)
    assert(cat.queryTyped("u", "typed", q, 10, Map("lang" -> "fr")).count() == 0)
  }

  test("typed query through the IVF index path with over-fetch + fallback") {
    val cat = new VectorStoreCatalog(spark,
      java.nio.file.Files.createTempDirectory("graft_typed_ivf").toString)
    cat.create("u", "ti", StoreConfig(dimension = 4))
    val rnd = new scala.util.Random(11)
    val src = (0 until 100).map { i =>
      (Seq.fill(4)(rnd.nextFloat()), i % 3)
    }.toDF("vector", "priority")
      .select($"vector", TypedMeta.metaColumn("priority" -> $"priority").as("meta"))
    cat.addVectors("u", "ti", src)
    cat.buildIndex("u", "ti", nLists = 4)

    val q = Seq.fill(4)(0.5)
    val ann = cat.queryTyped("u", "ti", q, 5, Map("priority" -> 2), nProbe = 4)
      .select($"id").collect().map(_.getLong(0)).toSeq
    val exact = cat.queryTyped("u", "ti", q, 5, Map("priority" -> 2), useIndex = false)
      .select($"id").collect().map(_.getLong(0)).toSeq
    assert(ann == exact, "full-probe typed ANN must equal typed exact scan")
  }
}
