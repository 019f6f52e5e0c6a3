package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

/** End-to-end chaos drill for the COMPOSED Nomad pipeline. The pieces are
  * individually pinned (source restart `AvailableNowSpec`, dedup state
  * recovery `HighWatermarkDedupSpec`, replay-safe output
  * `IdempotentParquetSinkSpec`) — this spec kills the whole
  * source → decode → dedup → classify → sink query in the worst window
  * (AFTER the sink wrote a batch, BEFORE the checkpoint committed it),
  * restarts from the same checkpoint, and requires the final output to
  * equal an uninterrupted run's EXACTLY: no lost notification, no
  * duplicate, and the dedup watermark state recovered so a post-restart
  * stale event still drops.
  */
class NomadChaosSpec extends SparkSpec {
  import spark.implicits._

  /** Silence the loggers that flood during the INJECTED kill window (the
    * executor/task-abort/state-store-commit stack traces are the expected
    * signature of crashing between sink write and checkpoint commit — r13
    * observed hundreds of `failedToCommitStateFileError` traces per run),
    * restoring their exact prior configuration afterwards so a REAL
    * state-store failure in any other run or suite still logs. Scoped to
    * the chaos-injection run only; the failure itself is still asserted on
    * (`e.getMessage.contains("chaos")`), so a non-injected death surfaces
    * through the assert even while the loggers are off. */
  private def quietKillWindow[T](f: => T): T = {
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.LoggerContext
    import org.apache.logging.log4j.core.config.Configurator
    val loggers = Seq(
      "org.apache.spark.executor.Executor",
      "org.apache.spark.scheduler.TaskSetManager",
      "org.apache.spark.sql.execution.streaming",
      "org.apache.spark.sql.execution.streaming.state",
      "org.apache.spark.util.Utils")
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val cfg = ctx.getConfiguration
    // remember which loggers had an EXPLICIT config (vs inheriting) so the
    // restore removes the configs this scope created instead of pinning a
    // level that wasn't pinned before
    val prev = loggers.map { l =>
      val lc = cfg.getLoggerConfig(l)
      l -> (if (lc.getName == l) Some(lc.getLevel) else None)
    }
    loggers.foreach(Configurator.setLevel(_, Level.OFF))
    try f
    finally {
      prev.foreach {
        case (l, Some(lvl)) => Configurator.setLevel(l, lvl)
        case (l, None) => ctx.getConfiguration.removeLogger(l)
      }
      ctx.updateLoggers()
    }
  }

  private def allocFrame(index: Long, job: String, evs: (String, Long, String)*): String = {
    val events = evs.map { case (typ, time, details) =>
      s"""{"Type":"$typ","Time":$time,"DisplayMessage":"$typ done","Details":$details}"""
    }.mkString(",")
    s"""{"Index":$index,"Events":[{"Topic":"Allocation","Type":"AllocationUpdated","Key":"k",""" +
      s""""Namespace":"default","Index":$index,"Payload":{"Allocation":{"ID":"a1","Namespace":"default",""" +
      s""""NodeName":"worker-1","JobID":"$job","TaskStates":{"main":{"State":"dead","Events":[$events]}}}}}]}"""
  }

  test("kill after sink write before commit: restart loses nothing, duplicates nothing") {
    val root = java.nio.file.Files.createTempDirectory("nomad-chaos").toString
    val in = s"$root/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))

    // Three files -> three single-file micro-batches (mtimes pinned so the
    // file source's modification-time ordering is deterministic):
    //   f0: heartbeat + jobA Terminated@2000           (batch 0, committed)
    //   f1: DUPLICATE jobA@2000 + jobB oom@3000        (batch 1, CRASHED then replayed)
    //   f2: STALE jobA restart@1500 + jobC started@4000 (batch 2, post-restart)
    // The stale f2 event only drops if the dedup watermark (jobA -> 2000)
    // SURVIVED the crash-restart; a state-losing restart leaks it.
    val files = Seq(
      "f0.ndjson" -> Seq("{}",
        allocFrame(200, "job-a", ("Terminated", 2000L, """{"exit_code":"0"}"""))),
      "f1.ndjson" -> Seq(
        allocFrame(201, "job-a", ("Terminated", 2000L, """{"exit_code":"0"}""")),
        allocFrame(202, "job-b", ("Terminated", 3000L, """{"oom_killed":"true","exit_code":"137"}"""))),
      "f2.ndjson" -> Seq(
        allocFrame(203, "job-a", ("Restart Signaled", 1500L, """{"restart_reason":"flaky"}""")),
        allocFrame(204, "job-c", ("Started", 4000L, "{}"))))
    files.zipWithIndex.foreach { case ((name, lines), i) =>
      val p = java.nio.file.Paths.get(in, name)
      java.nio.file.Files.write(p, lines.mkString("", "\n", "\n").getBytes("UTF-8"))
      p.toFile.setLastModified(1700000000000L + i * 60000L)
    }

    val cfg = PipelineConfig(startingIndex = 100)

    def pipeline() =
      NomadPipeline.stream(spark,
        spark.readStream.option("maxFilesPerTrigger", 1).text(in),
        cfg, initialWatermarkNs = 1000L)

    def run(out: String, cp: String, chaosOnBatch: Option[Long]): Boolean = {
      @volatile var crashed = false
      val q = pipeline().writeStream
        .option("checkpointLocation", cp)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          IdempotentParquetSink.write(out)(batch, id)
          if (chaosOnBatch.contains(id)) {
            crashed = true
            throw new RuntimeException("chaos: crash after sink write, before commit")
          }
        }
        .start()
      try { assert(q.awaitTermination(120000), "query did not terminate"); false }
      catch {
        case e: StreamingQueryException =>
          assert(crashed && e.getMessage.contains("chaos"),
            s"query died for a non-injected reason: ${e.getMessage}")
          true
      }
    }

    def outputSet(out: String): Seq[(String, String, Long, String, String)] = {
      val rows = spark.read.parquet(out)
        .select("task_identifier", "event_type", "event_time", "state", "subject")
        .as[(String, String, Long, String, String)].collect().toSeq
      assert(rows.distinct.size == rows.size, s"duplicate notifications in $out: $rows")
      rows.sortBy(r => (r._1, r._3, r._2))
    }

    // CHAOS run: crash inside batch 1 (sink written, commit pending), then
    // restart from the same checkpoint and drain to completion.
    val (outChaos, cpChaos) = (s"$root/out-chaos", s"$root/cp-chaos")
    assert(quietKillWindow(run(outChaos, cpChaos, chaosOnBatch = Some(1L))),
      "injected crash did not fire")
    assert(!run(outChaos, cpChaos, chaosOnBatch = None), "restart run must finish cleanly")

    // CLEAN reference run: same input, fresh checkpoint, never interrupted.
    val (outClean, cpClean) = (s"$root/out-clean", s"$root/cp-clean")
    assert(!run(outClean, cpClean, chaosOnBatch = None))

    val clean = outputSet(outClean)
    assert(clean.map(r => (r._1, r._2)) ==
      Seq(("job-a.main", "Terminated"), ("job-b.main", "Terminated"),
        ("job-c.main", "Started")),
      s"reference run shape: the duplicate@2000 and stale@1500 must drop: $clean")
    assert(outputSet(outChaos) == clean,
      "crash-restart output diverged from the uninterrupted run")
  }
}
