package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[GateScratch]] (the shared fixture-scratch machinery) and
  * [[SparkEntry.autoSessParts]] (input-volume-sized streaming state
  * partitions, r15).
  */
class ScratchSpec extends AnyFunSuite {

  test("rmTree removes nested trees and tolerates absence") {
    val root = java.nio.file.Files.createTempDirectory("scratch_spec")
    val nested = root.resolve("a/b")
    java.nio.file.Files.createDirectories(nested)
    java.nio.file.Files.writeString(nested.resolve("f.txt"), "x")
    GateScratch.rmTree(root)
    assert(!java.nio.file.Files.exists(root))
    GateScratch.rmTree(root) // second call is a no-op, not an error
  }

  test("root creates a live dir; tempDir dirs are distinct") {
    val r = java.nio.file.Paths.get(GateScratch.root("scratch_spec_root"))
    assert(java.nio.file.Files.isDirectory(r))
    val t1 = GateScratch.tempDir("scratch_spec_t")
    val t2 = GateScratch.tempDir("scratch_spec_t")
    assert(t1 != t2)
    GateScratch.rmTree(t1); GateScratch.rmTree(t2)
    GateScratch.rmTree(r) // the shutdown hook's later rm is then a no-op
  }

  /** A dir whose events.parquet is a single file of `bytes` length
    * (sparse — tmpfs/ext4 report logical size, which is what
    * autoSessParts reads).
    */
  private def dirWithEvents(bytes: Long): String = {
    val d = java.nio.file.Files.createTempDirectory("sess_parts_spec")
    val f = new java.io.RandomAccessFile(
      d.resolve("events.parquet").toFile, "rw")
    try f.setLength(bytes) finally f.close()
    d.toString
  }

  test("autoSessParts reproduces the measured A/B knee") {
    // calibration points from the r13/r14 sessionize A/Bs: 8 partitions
    // win up to sf1 (~2 and ~21 MiB of events), 16 win at sf10 (~214 MiB)
    val sf01 = dirWithEvents(2045762L)
    val sf1 = dirWithEvents(21325551L)
    val sf10 = dirWithEvents(213791794L)
    assert(SparkEntry.autoSessParts(sf01) === 8)
    assert(SparkEntry.autoSessParts(sf1) === 8)
    assert(SparkEntry.autoSessParts(sf10) === 16)
    Seq(sf01, sf1, sf10).foreach(p =>
      GateScratch.rmTree(java.nio.file.Paths.get(p)))
  }

  test("autoSessParts floors at 8, caps at 64, defaults on a missing dir") {
    val tiny = dirWithEvents(1L)
    val huge = dirWithEvents(20L * 1024 * 1024 * 1024) // sf1000-ish
    assert(SparkEntry.autoSessParts(tiny) === 8)
    assert(SparkEntry.autoSessParts(huge) === 64)
    assert(SparkEntry.autoSessParts("/nonexistent/dir") === 8)
    Seq(tiny, huge).foreach(p =>
      GateScratch.rmTree(java.nio.file.Paths.get(p)))
  }

  test("autoSessParts sums a directory-shaped events.parquet") {
    val d = java.nio.file.Files.createTempDirectory("sess_parts_dir")
    val ev = d.resolve("events.parquet")
    java.nio.file.Files.createDirectories(ev)
    Seq("part-0.parquet", "part-1.parquet").foreach { n =>
      val f = new java.io.RandomAccessFile(ev.resolve(n).toFile, "rw")
      try f.setLength(107000000L) finally f.close()
    }
    assert(SparkEntry.autoSessParts(d.toString) === 16) // ~214 MB total
    GateScratch.rmTree(d)
  }

  test("autoSessParts recurses a hive-partitioned events.parquet") {
    // part files nested under partition dirs: a top-level-only listing
    // sees zero regular files and collapses sizing to the 8 floor
    val d = java.nio.file.Files.createTempDirectory("sess_parts_nested")
    val ev = d.resolve("events.parquet")
    Seq("day=2026-01-01", "day=2026-01-02").zipWithIndex.foreach {
      case (part, i) =>
        val pd = ev.resolve(part)
        java.nio.file.Files.createDirectories(pd)
        val f = new java.io.RandomAccessFile(
          pd.resolve(s"part-$i.parquet").toFile, "rw")
        try f.setLength(107000000L) finally f.close()
    }
    assert(SparkEntry.autoSessParts(d.toString) === 16) // ~214 MB total
    GateScratch.rmTree(d)
  }
}
