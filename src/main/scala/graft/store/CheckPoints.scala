package graft.store

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Replication-checkpoint bookkeeping — the reference's
  * `CheckPointManager` (`include/cp.h:34-66`, `src/core/cp.cpp:40-259`).
  *
  * Replication clients hand in `<leader>:<channel>:<check-point>` strings
  * (the plain protocol's inline `_cp` command, `src/core/tsdb.cpp:2440-2450`);
  * the live map is snapshotted BEFORE a store flush and persisted AFTER it
  * completes (`src/core/tsdb.cpp:3297,3341`), so a persisted checkpoint
  * always implies every data point received before it is durably
  * committed — the invariant a replication follower resumes on. Snapshots
  * persist as `<epoch-sec>.cp` line files under the store root (newest 10
  * kept, newest loaded at boot — `cp.cpp:186-235,40-65`) and are served
  * back as JSON by the admin `cmd=cp` endpoint (`src/admin.cpp` Admin::cmd_cp).
  *
  * Deliberately driver-side: this is a few strings of metadata ABOUT
  * ingest progress per leader, not data — a distributed representation
  * would buy nothing and cost a job per update. The file writes go through
  * the store's Hadoop filesystem, so the checkpoint files live wherever
  * the store manifests live.
  */
final class CheckPoints(spark: SparkSession, root: String, keepFiles: Int = 10) {

  private type CpMap = Map[String, Map[String, String]]

  private def fs =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private var live: CpMap = Map.empty
  private var snapshot: CpMap = Map.empty
  private var persisted: CpMap = Map.empty
  private val lock = new Object

  // boot: replay the newest persisted file into the LIVE map only — like
  // the reference's init() (cp.cpp:40-65), the loaded state is not served
  // as "persisted" until the next snapshot/flush cycle re-persists it
  locally {
    newestFile().foreach { name =>
      val in = fs.open(new Path(s"$root/$name"))
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).foreach(add)
      finally in.close()
    }
  }

  /** Record a checkpoint string. Exactly three `:`-separated tokens
    * (`cp.cpp:71-99`); anything else is ignored with a false return.
    * Empty tokens are accepted — the reference's tokenize only counts
    * separators (utils.cpp:723-740), so `l::cp` is a valid checkpoint
    * for leader `l`, channel `""`. Later adds override earlier ones per
    * (leader, channel).
    */
  def add(cp: String): Boolean = {
    val tokens = cp.split(":", -1)
    if (tokens.length != 3) false
    else lock.synchronized {
      live = live.updated(tokens(0),
        live.getOrElse(tokens(0), Map.empty).updated(tokens(1), tokens(2)))
      true
    }
  }

  /** Capture the live map — call before starting a store flush
    * (`tsdb.cpp:3297`).
    */
  def takeSnapshot(): Unit = lock.synchronized { snapshot = live }

  /** Persist the last snapshot — call after the flush committed
    * (`tsdb.cpp:3341`). An empty snapshot writes no file but still
    * becomes the served state (`cp.cpp:187-194,198-203`).
    */
  def persist(nowSec: Long = System.currentTimeMillis() / 1000): Unit =
    lock.synchronized {
      if (snapshot.nonEmpty) {
        // <ts>.cp, bumped past any same-second persist so "newest" stays
        // well-defined (the reference overwrites on collision)
        var ts = nowSec
        while (fs.exists(new Path(s"$root/$ts.cp"))) ts += 1
        val tmp = new Path(s"$root/.cp_tmp_$ts")
        val out = fs.create(tmp, true)
        try out.write(flatLines(snapshot).mkString("\n").getBytes(UTF_8))
        finally out.close()
        if (!fs.rename(tmp, new Path(s"$root/$ts.cp")))
          throw new IllegalStateException(s"$ts.cp already published under $root")
        rotate()
      }
      persisted = snapshot
    }

  /** Shutdown hook: one last snapshot + persist (`cp.cpp:239-243`). */
  def close(): Unit = { takeSnapshot(); persist() }

  /** Last persisted state, JSON in the reference's exact shape
    * (`cp.cpp:109-183`):
    * `[{"leader":"1","channels":[{"channel":"ch1","checkpoint":"cp1"},…]},…]`.
    * Sorted for determinism where the reference's unordered_map order is
    * unspecified.
    */
  def persistedJson(leader: Option[String] = None): String = lock.synchronized {
    def obj(l: String, chans: Map[String, String]): String =
      s"""{"leader":"$l","channels":[""" +
        chans.toSeq.sortBy(_._1)
          .map { case (c, v) => s"""{"channel":"$c","checkpoint":"$v"}""" }
          .mkString(",") + "]}"
    val objs = leader match {
      case Some(l) => persisted.get(l).map(m => obj(l, m)).toSeq
      case None => persisted.toSeq.sortBy(_._1).map { case (l, m) => obj(l, m) }
    }
    objs.mkString("[", ",", "]")
  }

  /** Last persisted state as a map (tests, gates). */
  def persistedMap: Map[String, Map[String, String]] =
    lock.synchronized(persisted)

  /** Live (not yet persisted) state. */
  def liveMap: Map[String, Map[String, String]] = lock.synchronized(live)

  private def flatLines(m: CpMap): Seq[String] =
    m.toSeq.sortBy(_._1).flatMap { case (l, chans) =>
      chans.toSeq.sortBy(_._1).map { case (c, v) => s"$l:$c:$v" }
    }

  private def cpFiles(): Seq[(Long, String)] = {
    val dir = new Path(root)
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).filter(_.isFile).map(_.getPath.getName)
      .filter(n => n.endsWith(".cp") && !n.startsWith("."))
      .flatMap(n => n.stripSuffix(".cp").toLongOption.map(_ -> n))
      .toSeq.sortBy(_._1)
  }

  private def newestFile(): Option[String] = cpFiles().lastOption.map(_._2)

  // keep the newest `keepFiles` (reference rotate_files(pattern, 10))
  private def rotate(): Unit =
    cpFiles().dropRight(keepFiles)
      .foreach { case (_, n) => fs.delete(new Path(s"$root/$n"), false) }
}
