package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.embed.{EmbeddingProvider, HashingProvider, RotatedProvider}
import graft.operators.Adaptation

class AdaptationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val dim = 16
  val src = HashingProvider("s", dim, seed = 11L)
  val tgt = RotatedProvider(src, rotSeed = 3L)

  test("HashingProvider is deterministic and seed-sensitive") {
    val a = src.embedWord("spark")
    val b = src.embedWord("spark")
    val c = HashingProvider("x", dim, seed = 12L).embedWord("spark")
    assert(a.toSeq == b.toSeq)
    assert(a.toSeq != c.toSeq)
    assert(a.length == dim)
  }

  test("Word2VecProvider learns corpus semantics; OOV falls back deterministically") {
    import graft.embed.Word2VecProvider
    // Two disjoint topic vocabularies: words co-occur only within a topic,
    // so skip-gram must place same-topic words closer than cross-topic ones.
    val rnd = new scala.util.Random(7)
    def sent(ws: Seq[String]) =
      Seq.fill(12)(ws(rnd.nextInt(ws.size))).mkString(" ")
    val va = Seq("apple", "banana", "cherry", "date", "elder")
    val vb = Seq("quark", "gluon", "lepton", "boson", "meson")
    val docs = ((0 until 60).map(i => (i.toLong, sent(va))) ++
      (0 until 60).map(i => (100L + i, sent(vb)))).toDF("doc_id", "text")
    val p = Word2VecProvider.fit(docs, "text", dim = 16, minCount = 1,
      maxIter = 3, seed = 5L)
    assert(p.vocab.size == 10 && p.dim == 16)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val within = for (x <- va; y <- va if x < y)
      yield cos(p.embedWord(x), p.embedWord(y))
    val across = for (x <- va; y <- vb) yield cos(p.embedWord(x), p.embedWord(y))
    assert(within.sum / within.size > across.sum / across.size + 0.1,
      f"within-topic mean ${within.sum / within.size}%.3f should exceed " +
        f"cross-topic ${across.sum / across.size}%.3f")
    // OOV: total function, deterministic hashing fallback
    val o1 = p.embedWord("zzz_oov"); val o2 = p.embedWord("zzz_oov")
    assert(o1.toSeq == o2.toSeq && o1.length == 16)
    // the SPI plumbing accepts the learned provider unchanged
    val pooled = EmbeddingProvider.embedMeanPoolPartitions(
      docs.limit(10), "doc_id", "text", p)
    assert(pooled.count() == 10)
    assert(pooled.select("vec").head().getSeq[Double](0).size == 16)
  }

  test("RotatedProvider is an isometry (norm-preserving)") {
    val v = src.embedWord("engine")
    val r = tgt.embedWord("engine")
    val n1 = math.sqrt(v.map(x => x.toDouble * x).sum)
    val n2 = math.sqrt(r.map(x => x.toDouble * x).sum)
    assert(math.abs(n1 - n2) < 1e-5)
  }

  val docs = Seq(
    (0L, "alpha beta gamma delta alpha beta"),
    (1L, "alpha beta epsilon zeta alpha"),
    (2L, "gamma delta eta theta"),
    (3L, "alpha iota kappa beta")).toDF("doc_id", "text")

  test("wordPairDataset: counts match A1 and both spaces have dim vectors") {
    val pairs = Adaptation.wordPairDataset(docs, "text", 5, src, tgt).collect()
    val byWord = pairs.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byWord("alpha") == 5 && byWord("beta") == 4)
    assert(pairs.forall(r => r.getSeq[Float](2).size == dim &&
      r.getSeq[Float](3).size == dim))
  }

  test("procrustes recovers the rotation: mapped MSE ≈ 0, W orthogonal") {
    val pairs = Adaptation.wordPairDataset(docs, "text", 10, src, tgt)
    val w = Adaptation.procrustes(pairs, "source", "target", dim)
    val mse0 = Adaptation.mappingMse(pairs, "source", "target", None)
    val mse1 = Adaptation.mappingMse(pairs, "source", "target", Some(w))
    assert(mse1 < 1e-6, s"procrustes should undo a signed permutation (got $mse1)")
    assert(mse1 < mse0 / 100)
    val orthoDefect = (for (i <- 0 until dim; j <- 0 until dim) yield {
      val dot = (0 until dim).map(k => w(k)(i) * w(k)(j)).sum
      math.abs(dot - (if (i == j) 1.0 else 0.0))
    }).max
    assert(orthoDefect < 1e-9)
  }

  test("MLP mapping trains: loss decreases and beats identity") {
    val pairs = Adaptation.wordPairDataset(docs, "text", 10, src, tgt)
    val (_, losses) = Adaptation.fitMlp(pairs, "source", "target", dim,
      hidden = 32, epochs = 15, lr = 0.05)
    assert(losses.last < losses.head, s"losses: $losses")
  }

  test("partition-batched embedding equals the per-row UDF path (P3 batch shape)") {
    import graft.embed.EmbeddingProvider
    val p = graft.embed.HashingProvider("bt", 16, seed = 5L)
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta"), (3L, "eps zeta eta theta"),
      (4L, "iota kappa"), (5L, "lambda"), (6L, "mu nu xi"), (7L, "omicron pi"))
      .toDF("doc_id", "text").repartition(2)
    val batched = EmbeddingProvider.embedMeanPoolPartitions(docs, "doc_id", "text", p,
      batchSize = 3)
    val perRow = docs.select(col("doc_id"),
      EmbeddingProvider.embedMeanPoolCol(p)(col("text")).as("vec"))
    val j = batched.withColumnRenamed("vec", "a")
      .join(perRow.withColumnRenamed("vec", "b"), Seq("doc_id"))
    assert(j.count() == 7)
    val mismatches = j.filter(col("a") =!= col("b")).count()
    assert(mismatches == 0)
  }

  test("materialize writes pooled embeddings (S4)") {
    val out = java.nio.file.Files.createTempDirectory("s4").toString + "/emb"
    EmbeddingProvider.materialize(docs, "text", src, out)
    val back = spark.read.parquet(out)
    assert(back.count() == 4)
    assert(back.select(size(col("pooled"))).collect().forall(_.getInt(0) == dim))
  }

  test("S7 cache: second call reads the persisted parquet, params key the entry") {
    val root = java.nio.file.Files.createTempDirectory("s7").toString
    spark.conf.set("spark.graft.adaptCacheDir", root)
    try {
      val fresh = graft.operators.AdaptCache
        .wordPairDataset(docs, "mem://docs", "text", 5, src, tgt)
      val direct = Adaptation.wordPairDataset(docs, "text", 5, src, tgt)
      assert(fresh.orderBy("word").collect().toSeq ==
        direct.orderBy("word").collect().toSeq)
      // Prove the second call is a cache READ, not a recompute: tamper with the
      // persisted parquet (keep one row) and observe the tampered content.
      val k = graft.operators.AdaptCache.key("mem://docs", "text", 5, src, tgt)
      val path = s"$root/adapt_pairs_$k.parquet"
      val one = spark.read.parquet(path).limit(1)
      val tmp = root + "/tamper"
      one.write.parquet(tmp)
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(path))
      val second = graft.operators.AdaptCache
        .wordPairDataset(docs, "mem://docs", "text", 5, src, tgt)
      assert(second.count() == 1)
      // A different topK is a different key → recomputed, not the tampered file.
      val other = graft.operators.AdaptCache
        .wordPairDataset(docs, "mem://docs", "text", 3, src, tgt)
      assert(other.count() == 3)
      // Catalog registration (SURVEY §2.1 S7).
      assert(spark.catalog.tableExists(s"adapt_pairs_$k"))
    } finally spark.conf.unset("spark.graft.adaptCacheDir")
  }

  test("S3/S4 pooled-embedding cache: hit is a parquet read, provider keys it") {
    val root = java.nio.file.Files.createTempDirectory("s3").toString
    spark.conf.set("spark.graft.adaptCacheDir", root)
    try {
      val fresh = graft.operators.AdaptCache
        .pooledDocEmbeddings(docs, "mem://docs", "text", src)
      val direct = docs.select(org.apache.spark.sql.functions.col("doc_id"),
        graft.embed.EmbeddingProvider.embedMeanPoolCol(src)(
          org.apache.spark.sql.functions.col("text")).as("vec"))
      assert(fresh.orderBy("doc_id").collect().toSeq ==
        direct.orderBy("doc_id").collect().toSeq)
      // tamper-and-observe: the second call must READ the persisted file
      val dirs = new java.io.File(root).listFiles()
        .filter(f => f.getName.startsWith("pooled_docs_") && f.getName.endsWith(".parquet"))
      assert(dirs.length == 1)
      val path = dirs.head.getAbsolutePath
      val one = spark.read.parquet(path).limit(1)
      val tmp = root + "/tamper2"
      one.write.parquet(tmp)
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(path))
      val second = graft.operators.AdaptCache
        .pooledDocEmbeddings(docs, "mem://docs", "text", src)
      assert(second.count() == 1)
      // a different provider is a different key → full recompute
      val other = graft.operators.AdaptCache
        .pooledDocEmbeddings(docs, "mem://docs", "text", tgt)
      assert(other.count() == docs.count())
    } finally spark.conf.unset("spark.graft.adaptCacheDir")
  }
}
