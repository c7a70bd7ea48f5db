package graft.tools

import graft.core.Corpus
import graft.index.{IndexBuilder, IndexConfig, IndexReader}
import graft.search.Engine
import org.apache.spark.sql.SparkSession

/** Scaling-efficiency evidence for BASELINE.md: the SAME north-star job
  * (index build over an identical synthesized corpus + BM25 workload) at two
  * parallelism levels — local[N] standing in for an N-executor cluster.
  *
  * Method: the sandbox host throttles CPU in multi-second bursts (~30x
  * throughput swings observed), so a single run per level measures host
  * weather, not the job. This harness ALTERNATES legs (8, 32, 8, 32, ...)
  * inside one JVM (warm JIT for both levels), each leg a full fresh build
  * into tmpfs, and reports the BEST throughput per level — the un-throttled
  * capability at each parallelism.
  *
  * Usage: GRAFT_MAIN=graft.tools.ScalingBench scripts/bench_java.sh [nFiles] [reps]
  * Prints one JSON line.
  */
object ScalingBench {

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete(): Unit
  }

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val nFiles = if (args.nonEmpty) args(0).toLong else 160000L
    val reps = if (args.length > 1) args(1).toInt else 3
    // N and 4N cores; default 2→8 (within this host's memory-bandwidth
    // envelope — see BASELINE.md §3 for the 8→32 saturation evidence)
    val levels: Seq[Int] =
      if (args.length > 2) args(2).split(",").toSeq.map(_.trim.toInt)
      else Seq(2, 8)
    require(levels.size == 2 && levels(1) == 4 * levels(0), s"need N,4N levels, got $levels")
    val bestBuild = scala.collection.mutable.Map[Int, Double]().withDefaultValue(0.0)
    val bestQps = scala.collection.mutable.Map[Int, Double]().withDefaultValue(0.0)
    val bestP50 = scala.collection.mutable.Map[Int, Double]().withDefaultValue(Double.MaxValue)

    val queryTerms: Seq[String] =
      Seq("if", "return", "while") ++ Seq(5, 40, 300).map(Corpus.ident) ++
        Seq(2000, 3000, 4000, 4500).map(Corpus.ident)
    // 256 queries: enough work per batch job that 32 slots have something
    // to chew on (64-query batches finish in ~1s and measure overhead)
    val batch = (0 until 256).map { i =>
      val a = queryTerms(i % queryTerms.size)
      val b = queryTerms((i * 7 + 3) % queryTerms.size)
      val c = Corpus.ident(800 + (i * 13) % 3000)
      (i.toLong, if (a == b) s"$a $c" else s"$a $b $c")
    }

    for (rep <- 1 to reps; cpus <- levels) {
      val spark = session(cpus)
      import spark.implicits._
      val dir = s"/dev/shm/graft-scaling-build"
      deleteRecursively(new java.io.File(dir))
      val docs = spark.range(0, nFiles, 1, 64).map { i =>
        val f = Corpus.file(42L, i)
        (i, f.repo, f.path, f.commit, f.lang, f.content)
      }.toDF("docId", "repo", "path", "commit", "lang", "content")
      val t0 = System.nanoTime()
      IndexBuilder.build(spark, docs, dir,
        IndexConfig(tokenizerName = "TokenBigram", withPositions = true,
          nShards = 64, buildPartitions = 64,
          hotTermDf = math.max(1000L, nFiles / 8), nSalts = 8))
      val buildSec = (System.nanoTime() - t0) / 1e9
      val fps = nFiles / buildSec
      if (fps > bestBuild(cpus)) bestBuild(cpus) = fps

      // query workload on the leg's own index (serving mode: cached)
      val reader = new IndexReader(spark, dir).cacheForServing()
      Engine.bm25TopKBatch(reader, batch, 10).count() // warm
      val tq = System.nanoTime()
      Engine.bm25TopKBatch(reader, batch, 10).count()
      val qps = batch.size / ((System.nanoTime() - tq) / 1e9)
      if (qps > bestQps(cpus)) bestQps(cpus) = qps
      val lats = queryTerms.take(6).map { q =>
        val t = System.nanoTime()
        Engine.bm25TopK(reader, q, 10).collect()
        (System.nanoTime() - t) / 1e6
      }.sorted
      val p50 = lats(lats.size / 2)
      if (p50 < bestP50(cpus)) bestP50(cpus) = p50

      System.err.println(f"rep $rep local[$cpus]: build $fps%.1f files/s, batch $qps%.1f qps, p50 $p50%.0f ms")
      spark.stop()
    }

    val (n1, n4) = (levels(0), levels(1))
    val effBuild = bestBuild(n4) / bestBuild(n1) / 4.0
    val effQps = bestQps(n4) / bestQps(n1) / 4.0
    println(
      s"""{"metric":"scaling","n_files":$nFiles,"reps":$reps,"levels":[$n1,$n4],""" +
        s""""build_files_per_sec":{"local$n1":${f"${bestBuild(n1)}%.1f"},"local$n4":${f"${bestBuild(n4)}%.1f"}},""" +
        s""""bm25_batch_qps":{"local$n1":${f"${bestQps(n1)}%.1f"},"local$n4":${f"${bestQps(n4)}%.1f"}},""" +
        s""""bm25_p50_ms":{"local$n1":${f"${bestP50(n1)}%.1f"},"local$n4":${f"${bestP50(n4)}%.1f"}},""" +
        s""""scaling_efficiency":{"build":${f"$effBuild%.3f"},"bm25_batch":${f"$effQps%.3f"}}}""")
  }
}
