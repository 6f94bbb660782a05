package graft

import graft.model.Dp
import graft.store.{CheckPoints, Store}

/** Replication-checkpoint bookkeeping (reference `src/core/cp.cpp`):
  * add/override/reject grammar, the snapshot-before-flush /
  * persist-after-flush ordering invariant, file rotation, boot replay,
  * and the admin JSON shape.
  */
class CheckPointSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_cp").toString

  test("add: exactly three tokens, later adds override per (leader, channel)") {
    val cp = new CheckPoints(spark, tmp())
    assert(cp.add("l1:ch1:5"))
    assert(cp.add("l1:ch2:7"))
    assert(cp.add("l1:ch1:9")) // override
    assert(cp.add("l2:ch1:3"))
    assert(!cp.add("l1:ch1")) // 2 tokens (cp.cpp:76-80)
    assert(!cp.add("l1:ch1:5:x")) // 4 tokens
    assert(!cp.add("")) // empty (one token)
    // empty MIDDLE tokens are valid: the reference's tokenize counts
    // separators only (utils.cpp:723-740), so `l3::42` is leader l3,
    // channel "", cp 42
    assert(cp.add("l3::42"))
    assert(cp.liveMap === Map(
      "l1" -> Map("ch1" -> "9", "ch2" -> "7"),
      "l2" -> Map("ch1" -> "3"),
      "l3" -> Map("" -> "42")))
    assert(cp.persistedMap.isEmpty) // nothing served before a flush cycle
  }

  test("snapshot/persist ordering: a cp added mid-flush waits for the next cycle") {
    val cp = new CheckPoints(spark, tmp())
    cp.add("l:ch:1")
    cp.takeSnapshot() // flush starts
    cp.add("l:ch:2") // arrives while the flush runs
    cp.persist(nowSec = 1000) // flush committed
    assert(cp.persistedMap === Map("l" -> Map("ch" -> "1"))) // not "2"
    cp.takeSnapshot(); cp.persist(nowSec = 1001) // next cycle
    assert(cp.persistedMap === Map("l" -> Map("ch" -> "2")))
  }

  test("boot replay: newest .cp file loads into the live map, served after the next cycle") {
    val dir = tmp()
    val cp = new CheckPoints(spark, dir)
    cp.add("l:ch:old"); cp.takeSnapshot(); cp.persist(nowSec = 100)
    cp.add("l:ch:new"); cp.takeSnapshot(); cp.persist(nowSec = 200)
    val rebooted = new CheckPoints(spark, dir)
    assert(rebooted.liveMap === Map("l" -> Map("ch" -> "new"))) // newest file only
    assert(rebooted.persistedMap.isEmpty) // init loads live, not persisted (cp.cpp:40-65)
    rebooted.close() // shutdown's last snapshot+persist (cp.cpp:239-243)
    assert(rebooted.persistedMap === Map("l" -> Map("ch" -> "new")))
  }

  test("rotation keeps the newest 10 files; empty snapshot writes none") {
    val dir = tmp()
    val cp = new CheckPoints(spark, dir)
    cp.takeSnapshot(); cp.persist(nowSec = 1) // empty snapshot: no file
    cp.add("l:ch:0")
    (1 to 12).foreach { i => cp.takeSnapshot(); cp.persist(nowSec = 1000 + i) }
    val files = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.endsWith(".cp")).sorted.toSeq
    assert(files.size === 10)
    assert(files.head === "1003.cp" && files.last === "1012.cp")
  }

  test("persisted JSON matches the reference shape, with and without a leader filter") {
    val cp = new CheckPoints(spark, tmp())
    assert(cp.persistedJson() === "[]")
    cp.add("1:ch1:cp1"); cp.add("1:ch2:cp2"); cp.add("2:ch1:cp9")
    cp.takeSnapshot(); cp.persist(nowSec = 5)
    assert(cp.persistedJson() ===
      """[{"leader":"1","channels":[{"channel":"ch1","checkpoint":"cp1"},{"channel":"ch2","checkpoint":"cp2"}]},""" +
        """{"leader":"2","channels":[{"channel":"ch1","checkpoint":"cp9"}]}]""")
    assert(cp.persistedJson(Some("2")) ===
      """[{"leader":"2","channels":[{"channel":"ch1","checkpoint":"cp9"}]}]""")
    assert(cp.persistedJson(Some("nope")) === "[]")
  }

  test("store flush cycle: _cp persisted only once its preceding data is committed") {
    val dir = tmp()
    val store = new Store(spark, dir)
    def batch(ts: Long, seq: Long) = spark.createDataset(Seq(
      Dp("cp.m", Map("host" -> "a"), ts, 1.0, seq))).toDF()
    // checkpoint arrives between flushes: live immediately, persisted on
    // the NEXT ingest commit (snapshot-before, persist-after)
    store.ingest(batch(1704412800000L, 1))
    store.checkpoints.add("l:ch:42")
    assert(store.checkpoints.liveMap === Map("l" -> Map("ch" -> "42")))
    assert(store.checkpoints.persistedMap.isEmpty)
    store.ingest(batch(1704412860000L, 2))
    assert(store.checkpoints.persistedMap === Map("l" -> Map("ch" -> "42")))
    // a rebooted store sees the persisted file at its root
    assert(new Store(spark, dir).checkpoints.liveMap ===
      Map("l" -> Map("ch" -> "42")))
  }

  test("admin cmd=cp serves the persisted snapshot; leader param filters") {
    val dir = tmp()
    val store = new Store(spark, dir)
    store.checkpoints.add("1:chA:7")
    store.ingest(spark.createDataset(Seq(
      Dp("cp.m", Map("host" -> "a"), 1704412800000L, 1.0, 1L))).toDF())
    store.ingest(spark.createDataset(Seq(
      Dp("cp.m", Map("host" -> "a"), 1704412860000L, 2.0, 2L))).toDF())
    assert(api.Admin.execute(spark, Map("cmd" -> "cp"), Some(store)) ===
      Right("""[{"leader":"1","channels":[{"channel":"chA","checkpoint":"7"}]}]"""))
    assert(api.Admin.execute(spark, Map("cmd" -> "cp", "leader" -> "9"), Some(store)) ===
      Right("[]"))
  }
}
