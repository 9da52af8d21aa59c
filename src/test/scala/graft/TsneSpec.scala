package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ml.Tsne

/** M7 t-SNE contracts: the 2-D embedding preserves planted cluster
  * structure, the optimization makes progress, and a (input, seed) pair is
  * exactly reproducible — plus the viz-size input contract. */
class TsneSpec extends AnyFunSuite {

  // 3 well-separated Gaussian clusters in R^8
  private def clustered(n: Int, seed: Int): (Array[Array[Double]], Array[Int]) = {
    val rnd = new scala.util.Random(seed)
    val x = Array.tabulate(n) { i =>
      val c = i % 3
      Array.tabulate(8)(d => (if (d % 3 == c) 4.0 else 0.0) + rnd.nextGaussian() * 0.3)
    }
    (x, Array.tabulate(n)(_ % 3))
  }

  test("planted clusters stay separated in the 2-D embedding") {
    val (x, labels) = clustered(90, seed = 17)
    val (y, kl0, kl1) = Tsne.fitWithKl(x, dims = 2, perplexity = 10.0,
      iters = 300, seed = 42L)
    assert(kl1 < kl0, s"KL must decrease: $kl0 -> $kl1")
    def dist(a: Array[Double], b: Array[Double]) =
      math.sqrt(a.zip(b).map { case (p, q) => (p - q) * (p - q) }.sum)
    val pairs = for (i <- y.indices; j <- y.indices if i < j)
      yield (dist(y(i), y(j)), labels(i) == labels(j))
    val intra = pairs.filter(_._2).map(_._1)
    val inter = pairs.filterNot(_._2).map(_._1)
    val mIntra = intra.sum / intra.size
    val mInter = inter.sum / inter.size
    assert(mInter > 2.0 * mIntra,
      f"inter-cluster mean $mInter%.3f should dominate intra $mIntra%.3f")
  }

  test("deterministic: same input + seed reproduces the embedding exactly") {
    val (x, _) = clustered(40, seed = 5)
    val y1 = Tsne.fit(x, iters = 120, perplexity = 8.0, seed = 7L)
    val y2 = Tsne.fit(x, iters = 120, perplexity = 8.0, seed = 7L)
    assert(y1.map(_.toSeq).toSeq == y2.map(_.toSeq).toSeq)
    val y3 = Tsne.fit(x, iters = 120, perplexity = 8.0, seed = 8L)
    assert(y1.map(_.toSeq).toSeq != y3.map(_.toSeq).toSeq)
  }

  test("viz-size contract: oversized input is rejected, not silently slow") {
    val big = Array.fill(Tsne.MaxRows + 1)(Array.fill(4)(0.0))
    intercept[IllegalArgumentException] { Tsne.fit(big) }
  }
}
