package graft

import java.io.PrintWriter
import java.net.ServerSocket

import org.apache.spark.sql.streaming.Trigger

import graft.sources.SyslogSocket

/** syslog-over-TCP end to end on the loopback: a local server feeds
  * newline-framed RFC3164/RFC5424 lines, the socket-source stream parses
  * them with the shared kernel, and the memory sink must show the same
  * typed fields the batch parser produces.
  */
class SyslogSocketSpec extends SparkSpec {

  test("TCP syslog lines stream through parse_syslog with per-line format detect") {
    val lines = Seq(
      "<34>Oct 11 22:14:15 mymachine su[230]: 'su root' failed on /dev/pts/8",
      "<165>1 2003-10-11T22:14:15.003Z host.example app 77 ID47 - an event log entry",
      "totally unparseable line"
    )
    val server = new ServerSocket(0, 1, java.net.InetAddress.getLoopbackAddress)
    val port = server.getLocalPort
    // accept once, write all lines, keep the connection open until the
    // query stops (closing early fails the socket source's read loop)
    @volatile var conn: java.net.Socket = null
    val feeder = new Thread(() => {
      try {
        conn = server.accept()
        val out = new PrintWriter(conn.getOutputStream, true)
        lines.foreach(out.println)
        out.flush()
      } catch { case _: Exception => }
    })
    feeder.setDaemon(true)
    feeder.start()

    val q = SyslogSocket.events(spark, "127.0.0.1", port)
      .writeStream.format("memory").queryName("syslog_tcp")
      .outputMode("append").trigger(Trigger.ProcessingTime(200))
      .start()
    try {
      val deadline = System.currentTimeMillis() + 60000
      while (spark.table("syslog_tcp").count() < lines.length &&
             System.currentTimeMillis() < deadline)
        Thread.sleep(250)
      val rows = spark.table("syslog_tcp").collect()
        .map(r => r.getAs[String]("raw") -> r).toMap
      assert(rows.size == lines.length, s"expected ${lines.length} rows, got ${rows.size}")

      val classic = rows(lines(0))
      assert(classic.getAs[String]("format") == "rfc3164")
      assert(classic.getAs[Int]("priority") == 34)
      assert(classic.getAs[String]("hostname") == "mymachine")
      assert(classic.getAs[String]("program") == "su")
      assert(classic.getAs[Int]("pid") == 230)

      val modern = rows(lines(1))
      assert(modern.getAs[String]("format") == "rfc5424")
      assert(modern.getAs[String]("app_name") == "app")
      assert(modern.getAs[String]("msg_id") == "ID47")

      val junk = rows(lines(2))
      // unparseable → RFC3164 message-only fallback, like the batch kernel
      assert(junk.getAs[String]("format") == "rfc3164")
      assert(junk.getAs[String]("hostname") == null)
    } finally {
      q.stop()
      if (conn != null) conn.close()
      server.close()
    }
  }
}
