package graft.storage

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.SparkSpec

/** S11 — dataset + key-value-store client contracts driven over all four
  * backends each (reference `storage_clients/_base`): identical behavior
  * behind one trait, like RequestQueueClientContractSpec for the queue
  * contract.
  */
class StorageClientContractSpec extends SparkSpec {

  private var clockMs = 2000000L
  private def clock(): Long = { clockMs += 1; clockMs }

  // ---- helpers ---------------------------------------------------------------

  /** Canonical comparable form: parsed JSON with null-valued fields dropped
    * (Spark's toJSON omits nulls; local backends keep them — same record).
    */
  private def canon(json: String): Map[String, Any] =
    JsonMethods.parse(json) match {
      case JObject(fs) => fs.filterNot(_._2 == JNull).map { case (k, v) => k -> v.values }.toMap
      case other => Map("__value" -> other.values)
    }

  private def freshKvsBackends(): Seq[(String, KeyValueStoreClient)] = Seq(
    "memory" -> new MemoryKeyValueStoreClient(clock = clock _),
    "fs" -> new FileSystemKeyValueStoreClient(
      Files.createTempDirectory("fskvs").toString, clock = clock _),
    "sql" -> new SqlKeyValueStoreClient(
      Files.createTempDirectory("sqlkvs").toString + "/db", clock = clock _),
    "snapshot" -> new SnapshotKeyValueStoreClient(
      new KeyValueStore(spark, Files.createTempDirectory("snapkvs").toString), clock = clock _)
  )

  private def freshDatasetBackends(): Seq[(String, DatasetClient)] = Seq(
    "memory" -> new MemoryDatasetClient(clock = clock _),
    "fs" -> new FileSystemDatasetClient(
      Files.createTempDirectory("fsds").toString, clock = clock _),
    "sql" -> new SqlDatasetClient(
      Files.createTempDirectory("sqlds").toString + "/db", clock = clock _),
    "spark" -> new SparkDatasetClient(
      spark, new ResultDataset(spark, Files.createTempDirectory("sparkds").toString), clock = clock _)
  )

  // ---- KVS contract ----------------------------------------------------------

  test("KVS: set/get round trip, content types, exists, delete") {
    for ((label, c) <- freshKvsBackends()) {
      assert(c.getValue("a").isEmpty && !c.recordExists("a"), label)
      c.setJson("a", """{"x":1}""")
      c.setValue("b", Array[Byte](1, 2, 3))
      val a = c.getValue("a").get
      assert(a.asString == """{"x":1}""" && a.contentType.startsWith("application/json"), label)
      val b = c.getValue("b").get
      assert(b.value.toSeq == Seq[Byte](1, 2, 3), label)
      assert(b.contentType == "application/octet-stream", label)
      assert(c.recordExists("a") && c.recordExists("b"), label)
      // overwrite wins
      c.setJson("a", """{"x":2}""")
      assert(c.getValue("a").get.asString == """{"x":2}""", label)
      c.deleteValue("a")
      assert(!c.recordExists("a") && c.getValue("a").isEmpty, label)
      assert(c.publicUrl("b").nonEmpty, label)
      c.drop()
    }
  }

  test("KVS: iterateKeys sorted ascending with exclusiveStartKey + limit") {
    for ((label, c) <- freshKvsBackends()) {
      Seq("delta", "alpha", "charlie", "bravo").foreach(k => c.setJson(k, s"""{"k":"$k"}"""))
      val all = c.iterateKeys()
      assert(all.map(_.key) == Seq("alpha", "bravo", "charlie", "delta"), label)
      assert(all.forall(_.size > 0), label)
      assert(c.iterateKeys(exclusiveStartKey = Some("bravo")).map(_.key) == Seq("charlie", "delta"), label)
      assert(c.iterateKeys(limit = Some(2)).map(_.key) == Seq("alpha", "bravo"), label)
      assert(c.iterateKeys(Some("alpha"), Some(1)).map(_.key) == Seq("bravo"), label)
      c.drop()
    }
  }

  test("KVS: purge empties but keeps the storage usable; metadata id stable") {
    for ((label, c) <- freshKvsBackends()) {
      c.setJson("a", "{}")
      val idBefore = c.metadata.id
      c.purge()
      assert(c.iterateKeys().isEmpty, label)
      c.setJson("z", """{"ok":true}""")
      assert(c.recordExists("z"), label)
      assert(c.metadata.id == idBefore, label)
      c.drop()
    }
  }

  test("KVS: FS backend restart recovers records, content types and metadata") {
    val dir = Files.createTempDirectory("fskvs-restart").toString
    val a = new FileSystemKeyValueStoreClient(dir, clock = clock _)
    a.setJson("state", """{"n":7}""")
    a.setValue("blob", "raw".getBytes(StandardCharsets.UTF_8), "text/plain")

    val b = new FileSystemKeyValueStoreClient(dir, clock = clock _)
    assert(b.id == a.id)
    assert(b.getValue("state").get.asString == """{"n":7}""")
    assert(b.getValue("state").get.contentType.startsWith("application/json"))
    assert(b.getValue("blob").get.contentType == "text/plain")
    assert(b.iterateKeys().map(_.key) == Seq("blob", "state"))
    b.drop()
  }

  test("KVS: FS keys are percent-encoded on disk (reference _encode_key)") {
    val dir = Files.createTempDirectory("fskvs-enc").toString
    val c = new FileSystemKeyValueStoreClient(dir, clock = clock _)
    val key = "a/b c?.json"
    c.setJson(key, """{"v":1}""")
    assert(c.recordExists(key))
    assert(c.iterateKeys().map(_.key) == Seq(key), "round-trips through encoding")
    import scala.jdk.CollectionConverters._
    val files = Files.list(java.nio.file.Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString).toSeq
    assert(!files.exists(_.contains("/")), "no raw separators on disk")
    assert(files.exists(_.startsWith("a%2Fb%20c%3F.json")), s"percent-encoded name, got $files")
    c.drop()
  }

  // ---- dataset contract ------------------------------------------------------

  private val corpus: Seq[String] = Seq(
    """{"name":"a","num":1,"tags":["x","y"],"nested":{"p":1,"q":"one"}}""",
    """{"name":"b","num":2,"tags":["z"],"nested":{"p":2,"q":"two"},"#debug":"hidden"}""",
    """{"name":"c","num":3,"tags":["w","v"],"nested":{"p":3,"q":"three"}}""",
    """{"name":null,"num":null,"tags":null,"nested":null}""",
    """{"name":"e","num":5,"tags":["u"],"nested":{"p":5,"q":"five"}}"""
  )

  test("dataset: push + full read keeps insertion order; count/total; metadata") {
    for ((label, c) <- freshDatasetBackends()) {
      c.pushData(corpus.take(3))
      c.pushData(corpus.drop(3))
      val page = c.getData()
      assert(page.count == 5 && page.total == 5, label)
      assert(page.items.map(canon) == corpus.map(canon), s"$label: insertion order")
      assert(c.metadata.itemCount == 5, label)
      c.drop()
    }
  }

  test("dataset: offset/limit/desc pagination identical across backends") {
    for ((label, c) <- freshDatasetBackends()) {
      c.pushData(corpus)
      val p = c.getData(DatasetReadOptions(offset = 1, limit = 2))
      assert(p.count == 2 && p.total == 5, label)
      assert(p.items.map(canon) == corpus.slice(1, 3).map(canon), label)
      val d = c.getData(DatasetReadOptions(desc = true, limit = 2))
      assert(d.items.map(canon) == corpus.reverse.take(2).map(canon), label)
      c.drop()
    }
  }

  test("dataset: full D4-D9 option surface identical across backends") {
    for ((label, c) <- freshDatasetBackends()) {
      c.pushData(corpus)
      // D4 skip_empty drops the all-null item
      assert(c.getData(DatasetReadOptions(skipEmpty = true)).count == 4, label)
      // D9/clean drops '#'-fields and empty items
      val clean = c.getData(DatasetReadOptions(clean = true))
      assert(clean.count == 4, label)
      assert(!clean.items.exists(_.contains("#debug")), label)
      // D5 fields projection
      val f = c.getData(DatasetReadOptions(fields = Seq("num", "name"), skipEmpty = true))
      assert(f.items.map(canon).forall(_.keySet.subsetOf(Set("num", "name"))), label)
      // D6 omit
      val o = c.getData(DatasetReadOptions(omit = Seq("tags", "nested", "#debug")))
      assert(o.items.map(canon).forall(m => !m.contains("tags") && !m.contains("nested")), label)
      // D7 unwind multiplies by array length and drops the null-array item
      val u = c.getData(DatasetReadOptions(unwind = Some("tags"), fields = Seq("name", "tags")))
      assert(u.count == 6, s"$label: 2+1+2+0+1 unwound")
      assert(u.items.map(canon).count(_.get("tags").contains("y")) == 1, label)
      // D8 flatten lifts struct members
      val fl = c.getData(DatasetReadOptions(flatten = Some("nested"), skipEmpty = true,
        fields = Seq("name", "p", "q")))
      assert(fl.items.map(canon).exists(m => m.get("p").exists(_.toString == "2") &&
        m.get("q").contains("two")), label)
      c.drop()
    }
  }

  test("dataset: cross-backend page equality on a composed query") {
    val opts = DatasetReadOptions(unwind = Some("tags"), clean = true, desc = true,
      offset = 1, limit = 3, omit = Seq("nested"))
    val pages = freshDatasetBackends().map { case (label, c) =>
      c.pushData(corpus)
      val p = c.getData(opts).items.map(canon)
      c.drop()
      label -> p
    }
    val expected = pages.head._2
    assert(expected.nonEmpty)
    pages.tail.foreach { case (label, p) => assert(p == expected, s"$label != ${pages.head._1}") }
  }

  test("dataset: exportToKvs writes one consolidated CSV/JSON record (reference export_to)") {
    for ((label, c) <- freshDatasetBackends()) {
      val kvs = new MemoryKeyValueStoreClient()
      c.pushData(corpus)
      c.exportToKvs(kvs, "out.json", "json")
      val js = kvs.getValue("out.json").get
      assert(js.contentType == "application/json", label)
      val arr = JsonMethods.parse(js.asString).asInstanceOf[JArray].arr
      assert(arr.length == 5, label)
      c.exportToKvs(kvs, "out.csv", "csv")
      val csv = kvs.getValue("out.csv").get
      assert(csv.contentType == "text/csv", label)
      val lines = csv.asString.split("\n")
      // first-item columns; 4 non-empty items (the all-null item still has
      // fields, so it serializes as empty cells — only the truly empty
      // object is skipped, none here)
      assert(lines.head.split(",").toSet.contains("name"), label)
      assert(lines.length == 6, s"$label: header + 5 rows, got ${lines.length}")
      intercept[IllegalArgumentException](c.exportToKvs(kvs, "x", "xml"))
      c.drop()
    }
  }

  test("dataset: purge keeps storage usable; FS restart continues numbering") {
    for ((label, c) <- freshDatasetBackends()) {
      c.pushData(corpus.take(2))
      c.purge()
      assert(c.getData().count == 0 && c.metadata.itemCount == 0, label)
      c.pushData(corpus.take(1))
      assert(c.getData().count == 1, label)
      c.drop()
    }
    val dir = Files.createTempDirectory("fsds-restart").toString
    val a = new FileSystemDatasetClient(dir, clock = clock _)
    a.pushData(corpus.take(2))
    val b = new FileSystemDatasetClient(dir, clock = clock _)
    assert(b.metadata.itemCount == 2 && b.id == a.id)
    b.pushData(corpus.slice(2, 3))
    assert(b.getData().items.map(canon) == corpus.take(3).map(canon), "numbering continues across restart")
    b.drop()
  }
}
