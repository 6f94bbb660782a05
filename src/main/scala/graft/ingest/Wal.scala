package graft.ingest

import java.io.{BufferedWriter, File, FileWriter}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

/** Write-ahead log for the line-ingest edges — the Spark-side twin of the
  * reference's `AppendLog` (`include/append.h:36-57`,
  * `src/core/page.cpp:300`): raw received lines are appended to a local
  * segment file BEFORE they are acknowledged/buffered, and a segment is
  * deleted only after its batch's parquet commit returns, so an abnormal
  * termination between accept and flush loses nothing. Where the
  * reference periodically snapshots unflushed in-memory pages and
  * `restore()`s them on boot, here the WAL is the hand-off queue itself:
  * leftover segments from a crash are indistinguishable from pending
  * segments, and boot-time replay is just the normal flush loop draining
  * them first.
  *
  * Crash window semantics: a crash BETWEEN the store's parquet commit and
  * the segment delete re-ingests that batch on restart. This is
  * query-safe by construction: the duplicate points carry a fresh `seq`
  * but identical values, the raw path's last-wins dedup collapses them,
  * and [[graft.store.Store]]'s write-time slice marking flags the touched
  * slices out-of-order (replayed `bmin <= hwm`), which routes queries for
  * those slices back to the deduped raw path instead of the (now
  * double-counted) maintained rollup. So at-least-once delivery from the
  * WAL composes with the store into exactly-once query results.
  *
  * One instance per transport (its own directory): records are raw
  * protocol lines with no framing beyond `\n`, so the owning transport's
  * parser is the segment's codec. Appends are serialized; `roll`/`delete`
  * are called from the single flusher thread.
  */
final class Wal(dir: String) {
  Files.createDirectories(Paths.get(dir))

  private val SegPrefix = "wal-"
  private val SegSuffix = ".log"

  private def segFile(n: Long) =
    new File(dir, f"$SegPrefix$n%016d$SegSuffix")

  private def listSegments(): Seq[File] =
    Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith(SegPrefix) && f.getName.endsWith(SegSuffix))
      .sortBy(_.getName).toSeq

  // next segment number: above anything left on disk by a prior process
  private var nextSeg: Long = listSegments().lastOption
    .map(f => f.getName.stripPrefix(SegPrefix).stripSuffix(SegSuffix).toLong + 1)
    .getOrElse(0L)

  // segments present at construction = a prior process's unflushed tail;
  // they drain through roll() ahead of anything appended afterwards, so
  // replayed points take lower seq windows than post-restart traffic
  private var pending: Vector[File] = listSegments().toVector

  private var current: Option[(File, BufferedWriter)] = None

  /** Append one line to the current segment, flushed to the OS before
    * return (the reference's `append.log.flush.frequency` knob maps to
    * per-append flush here; segment close is the sync point).
    */
  def append(line: String): Unit = synchronized {
    val (_, w) = current.getOrElse {
      val f = segFile(nextSeg); nextSeg += 1
      val opened = (f, new BufferedWriter(new FileWriter(f, UTF_8, true)))
      current = Some(opened)
      opened
    }
    w.write(line); w.write('\n'); w.flush()
  }

  /** Oldest undelivered segment: a crashed predecessor's leftover first,
    * else the current segment (closed and handed over). None = nothing
    * buffered.
    */
  def roll(): Option[File] = synchronized {
    pending match {
      case head +: tail => pending = tail; Some(head)
      case _ =>
        current.map { case (f, w) => w.close(); current = None; f }
    }
  }

  /** Drop a delivered segment (call only after the batch's store commit
    * returned).
    */
  def delete(seg: File): Unit = { seg.delete(); () }

  /** Put a rolled-but-undelivered segment back at the head (ingest threw;
    * the durable copy must stay tracked for retry, not wait for a
    * restart).
    */
  def requeue(seg: File): Unit = synchronized { pending = seg +: pending }

  /** Anything not yet delivered? (quiesce checks) */
  def isEmpty: Boolean = synchronized(pending.isEmpty && current.isEmpty)

  def close(): Unit = synchronized {
    current.foreach(_._2.close())
    // keep the file: it is the crash tail the next boot replays
    current = None
  }
}

object Wal {
  /** A segment's lines, in append order. */
  def readLines(seg: File): Seq[String] =
    Files.readAllLines(seg.toPath, UTF_8).asScala.toSeq.filter(_.nonEmpty)
}
