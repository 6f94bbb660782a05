package graft

import graft.api.{HttpApi, SelfMetrics}
import graft.ingest.{MqttLineClient, SeqWindows, TcpLineServer, UdpLineServer}
import graft.store.Store
import org.apache.spark.sql.SparkSession

/** Runnable engine: the full port table of the reference
  * (`src/core/http.cpp:95-116` HTTP endpoints; `include/config.h:78-79`
  * TCP data ports; `src/core/udp.cpp` best-effort ingest) over ONE
  * maintained [[Store]], plus the periodic self-metrics flush the
  * reference runs as a background stats task (`src/utils/stats.cpp`).
  *
  *   sbt "runMain graft.ServerMain /tmp/graft_store 6182 6181 6180 6180"
  *
  * args: storeDir [httpPort tcpPlainPort tcpInfluxPort udpPort
  * flushSeconds] — ports default to the reference's 6182/6181/6180,
  * UDP shares 6180's number on its own protocol, flush every 30 s.
  * `SPARK_GRAFT_WAL_DIR=<dir>` arms the socket transports' write-ahead
  * log (the reference's `append.log.enabled`, `include/config.h:30`):
  * received lines spool to disk before batching and a crashed process's
  * tail replays at next boot.
  * `SPARK_GRAFT_MQTT="host:1883,topic=line,topic2=plain"` additionally
  * subscribes to an MQTT broker (the reference's `mqtt.settings`).
  *
  * The driver JVM hosts the listeners; every request's heavy lifting is
  * ordinary distributed Spark. All transports share one [[SeqWindows]]
  * so cross-transport duplicates resolve by arrival order under the
  * store's last-wins dedup.
  */
object ServerMain {
  def main(args: Array[String]): Unit = {
    val storeDir = args.headOption.getOrElse("/tmp/graft_store")
    def port(i: Int, default: Int) =
      args.lift(i).flatMap(_.toIntOption).getOrElse(default)
    val (httpPort, tcpPort, influxPort, udpPort) =
      (port(1, 6182), port(2, 6181), port(3, 6180), port(4, 6180))
    val flushSeconds = port(5, 30)

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .appName("graft")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // auto-compaction rename-swaps a day dir; a query that listed
      // files just before the swap then degrades to skipping the
      // replaced small files instead of failing the request
      .config("spark.sql.files.ignoreMissingFiles", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val recorder = SelfMetrics.install(spark)
    val store = new Store(spark, storeDir)
    val seqs = new SeqWindows()
    val http = new HttpApi(spark, store, port = httpPort,
      recorder = Some(recorder), sharedSeqs = Some(seqs),
      bindAddr = sys.env.getOrElse("SPARK_GRAFT_BIND", "127.0.0.1")).start()
    val walDir = sys.env.get("SPARK_GRAFT_WAL_DIR")
    def wal(name: String) = walDir.map(d => s"$d/$name")
    // SPARK_GRAFT_BIND=0.0.0.0 serves remote collectors; loopback default
    val bind = sys.env.getOrElse("SPARK_GRAFT_BIND", "127.0.0.1")
    // diediedie on the put socket = full-process shutdown, like the
    // reference's admin stop task (admin.cpp:317-331)
    val tcp = new TcpLineServer(spark, store, proto = "plain",
      port = tcpPort, seqs = seqs, walDir = wal("tcp-plain"), bindAddr = bind,
      recorder = Some(recorder), onShutdownCmd = Some(() => sys.exit(0)))
    val influx = new TcpLineServer(spark, store, proto = "influx",
      port = influxPort, seqs = seqs, walDir = wal("tcp-influx"), bindAddr = bind)
    val udp = new UdpLineServer(spark, store, port = udpPort, seqs = seqs,
      walDir = wal("udp"), bindAddr = bind)
    // optional MQTT subscription (the reference's mqtt.settings,
    // `src/utils/mqtt.cpp:101-210`), compact env form:
    //   SPARK_GRAFT_MQTT="host:1883,tele/metrics=line,tele/put=plain"
    val mqtt = sys.env.get("SPARK_GRAFT_MQTT").map { cfg =>
      val parts = cfg.split(",").toSeq
      val hostPort = parts.head.split(":")
      require(hostPort.length == 2 && hostPort(1).toIntOption.isDefined,
        s"SPARK_GRAFT_MQTT must start with host:port, got '${parts.head}'")
      val topics = parts.tail.map { t =>
        val i = t.lastIndexOf('=')
        if (i < 0) t -> "plain" else t.take(i) -> t.drop(i + 1)
      }
      require(topics.nonEmpty,
        "SPARK_GRAFT_MQTT needs at least one topic: host:port,topic=format,…")
      new MqttLineClient(spark, store, hostPort(0), hostPort(1).toInt, topics,
        seqs = seqs, walDir = wal("mqtt"))
    }

    // periodic self-metrics flush into the store (graft.* series become
    // queryable like the reference's ticktock.* stats)
    val flusher = new Thread(() => {
      while (true) {
        Thread.sleep(flushSeconds * 1000L)
        try http.flushSelfMetrics()
        catch { case e: Exception =>
          System.err.println(s"[graft] self-metrics flush failed: ${e.getMessage}")
        }
      }
    }, "graft-selfmetrics-flush")
    flusher.setDaemon(true)
    flusher.start()

    println(s"graft serving: http=${http.boundPort} tcp-plain=${tcp.boundPort} " +
      s"tcp-influx=${influx.boundPort} udp=${udp.boundPort} " +
      s"mqtt=${mqtt.isDefined} store=$storeDir")
    sys.addShutdownHook {
      mqtt.foreach(_.stop())
      tcp.stop(); influx.stop(); udp.stop(); http.stop(); spark.stop()
    }
    Thread.currentThread.join() // serve until killed
  }
}
