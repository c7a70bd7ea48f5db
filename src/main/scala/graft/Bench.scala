package graft

import graft.core.Corpus
import graft.index.{DocIndex, IndexBuilder, IndexConfig, IndexReader}
import graft.search.Engine
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: north-star index-build throughput (files/sec) over
  * the synthesized source-code corpus, top-k BM25 query latency (p50/p95)
  * over the built index, plus headline relational/pipeline queries from
  * SparkEntry on the testdata tables.
  *
  * Partitioning is FIXED (64) across parallelism levels so that
  * local[8] vs local[32] runs execute the identical job graph — the
  * scaling-efficiency comparison (BASELINE.md) is then purely about
  * executor slots, the sandbox stand-in for N vs 4N executors.
  *
  * Prints exactly one JSON line.
  */
object Bench {

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete(): Unit
  }

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val buildN: Long = sys.env.get("SPARK_GRAFT_BUILD_N").map(_.toLong).getOrElse {
      if (sfDir.contains("sf0.1")) 40000L
      else if (sfDir.contains("sf0.01")) 8000L
      else 2000L
    }
    // Shuffle/spill on tmpfs: on a real cluster each executor has local
    // NVMe; on this single VM all 32 slots would otherwise contend on one
    // virtual disk whose throughput doesn't scale with cores — a sandbox
    // artifact the N-vs-4N comparison must not measure.
    val localDir = sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/graft-spark-local")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", localDir)
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ---- north-star: index build throughput over synthesized code files --
    val buildBase = sys.env.getOrElse("SPARK_GRAFT_BENCH_DIR",
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm" else sys.props("java.io.tmpdir"))
    val buildDir = s"$buildBase/graft-bench-build-$cpus"
    deleteRecursively(new java.io.File(buildDir))
    import spark.implicits._
    // docId = the generator's row index — already dense and deterministic
    val docs = spark.range(0, buildN, 1, 64).map { i =>
      val f = Corpus.file(42L, i)
      (i, f.repo, f.path, f.commit, f.lang, f.content)
    }.toDF("docId", "repo", "path", "commit", "lang", "content")
    val (manifest, buildSec) = time {
      IndexBuilder.build(spark, docs, buildDir,
        IndexConfig(tokenizerName = "TokenBigram", withPositions = true,
          nShards = 64, buildPartitions = 64,
          hotTermDf = math.max(1000L, buildN / 8), nSalts = 8))
    }
    val filesPerSec = buildN / buildSec

    // ---- BM25 top-k latency over the built index -------------------------
    // serving mode: index pinned in executor memory (Groonga's mmap analogue)
    val reader = new IndexReader(spark, buildDir).cacheForServing()
    val queryTerms: Seq[String] =
      Seq("if", "return", "while") ++ // hot keywords (salted)
        Seq(5, 40, 300).map(Corpus.ident) ++ // mid-frequency idents
        Seq(2000, 3000, 4000, 4500).map(Corpus.ident) // rare idents
    val bmQueries: Seq[String] =
      queryTerms.map(t => s"$t") ++
        Seq("if " + Corpus.ident(3000), "return " + Corpus.ident(40),
          Corpus.ident(5) + " " + Corpus.ident(2000))
    // warm-up pass (JIT, parquet footers, broadcast)
    bmQueries.foreach(q => Engine.bm25TopK(reader, q, 10).collect())
    val lats = bmQueries.map { q =>
      val (_, s) = time(Engine.bm25TopK(reader, q, 10).collect())
      s * 1000.0
    }.sorted
    def pct(p: Double): Double = lats(math.min(lats.size - 1, (p * lats.size).toInt))

    // ---- batched-query throughput: one job answers a 64-query workload ---
    val batch = (0 until 64).map { i =>
      val a = queryTerms(i % queryTerms.size)
      val b = queryTerms((i * 7 + 3) % queryTerms.size)
      (i.toLong, if (a == b) a else s"$a $b")
    }
    Engine.bm25TopKBatch(reader, batch, 10).count() // warm
    val (_, batchSec) = time(Engine.bm25TopKBatch(reader, batch, 10).count())

    // ---- headline SparkEntry queries on the testdata tables --------------
    // (skipped in scaling mode: the N-vs-4N comparison measures the
    // north-star build + query workload only, on identical input)
    val headline =
      if (sys.env.contains("SPARK_GRAFT_SCALING_MODE")) Seq.empty[String]
      else Seq("q1_drilldown_calc", "q4_ref_join", "q7_window_subrec",
        "ft_bm25_topk", "dd_ngram_jaccard", "dd_lsh_pairs", "sim_topk",
        "ta_quality")
    val qTimes = headline.map { name =>
      val fn = SparkEntry.queries(name)
      val (_, s) = time(fn(spark, sfDir).collect())
      name -> s
    }

    val total = buildSec + lats.sum / 1000.0 + qTimes.map(_._2).sum
    val qJson = (qTimes.map { case (k, v) => s""""$k":${f"$v%.3f"}""" } ++
      Seq(s""""index_build":${f"$buildSec%.3f"}"""))
      .mkString("{", ",", "}")
    println(
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qJson,"sf":"$sfDir",""" +
        s""""cpus":$cpus,"build":{"files":$buildN,"sec":${f"$buildSec%.3f"},"files_per_sec":${f"$filesPerSec%.1f"},""" +
        s""""total_tokens":${manifest.totalTokens},"num_docs":${manifest.numDocs}},""" +
        s""""bm25":{"n_queries":${bmQueries.size},"p50_ms":${f"${pct(0.5)}%.1f"},"p95_ms":${f"${pct(0.95)}%.1f"}},""" +
        s""""bm25_batch":{"n":${batch.size},"sec":${f"$batchSec%.3f"},"qps":${f"${batch.size / batchSec}%.1f"}}}""")
    spark.stop()
  }
}
