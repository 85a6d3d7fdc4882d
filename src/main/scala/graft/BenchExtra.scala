package graft

/** Round-6 optimization harness (guide §1): NOT part of the driver contract —
  * `graft.Bench` stays the frozen measurement. This main exists so every
  * declared query (not just the 15 headline entries) has a measured
  * before/after number, and so plan dumps land in plans/r06/.
  *
  * Modes:
  *   BenchExtra time [names...|all]   — warm + 5 reps of .count() per query
  *                                      (the Bench methodology), min reported
  *   BenchExtra noop [names...|all]   — same but the action is a noop-sink
  *                                      write (guide §1.4): every column of
  *                                      every row computed, sink-free
  *   BenchExtra plans <outDir> [...]  — .explain("formatted") per query to
  *                                      <outDir>/<name>.txt
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
  * SPARK_GRAFT_EXTRA_REPS (default 5).
  */
object BenchExtra {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_EXTRA_REPS", "5").toInt
    val mode = args.headOption.getOrElse("time")
    val spark = GraftSession.get(cpus)

    def resolve(names: Seq[String]): Seq[String] =
      if (names.isEmpty || names.contains("all")) SparkEntry.queries.keys.toSeq.sorted
      else if (names.contains("headline")) Bench.HeadlineQueries
      else names

    mode match {
      case "plans" =>
        val outDir = args(1)
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
        resolve(args.drop(2).toSeq).foreach { name =>
          val plan = SparkEntry.queries(name)(spark, sfDir)
            .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(outDir, s"$name.txt"),
            plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          println(s"PLAN_WRITTEN $name")
        }
      case m => // "time" | "noop"
        val names = resolve(args.drop(1).toSeq)
        val results = names.map { name =>
          val fn = SparkEntry.queries(name)
          spark.sparkContext.setJobDescription(s"benchextra:$name")
          def action(): Unit =
            if (m == "noop")
              fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            else fn(spark, sfDir).count()
          val secs =
            try {
              action() // warm (discarded)
              val times = (1 to reps).map { _ =>
                val t0 = System.nanoTime()
                action()
                (System.nanoTime() - t0) / 1e9
              }
              times.min
            } catch { case e: Throwable =>
              System.err.println(s"FAIL $name: ${e.getClass.getSimpleName}: ${e.getMessage}")
              -1.0
            }
          println(f"QTIME $name $secs%.3f")
          name -> secs
        }
        val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
          .mkString("{", ",", "}")
        println(s"""{"mode":"$m","sf":"$sfDir","reps":$reps,"queries":$qs}""")
    }
    spark.stop()
  }
}
