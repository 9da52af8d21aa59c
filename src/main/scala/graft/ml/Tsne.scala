package graft.ml

/** Exact t-SNE (van der Maaten & Hinton 2008) for the M7 visualization
  * reduction — closing the documented "t-SNE out of scope" divergence
  * (reference: adaptation/mapping.py:43-92 reduces with sklearn t-SNE for
  * scatter plots).
  *
  * Deliberately DRIVER-LOCAL: visualization output is plot-sized by
  * contract — the reference reduces a small word/stream sample to 2-D for
  * seaborn, never the corpus. The engine's distributed stages do the heavy
  * lifting upstream (sampling, pooling, PCA pre-reduction when dims are
  * large); this kernel takes the ≤ `MaxRows` sample those stages emit and
  * runs the exact O(n²) algorithm, which at viz scale (≤ 2k points) is
  * fractions of a second and needs no Barnes–Hut approximation. An input
  * above the bound is a contract violation, not a scaling path — callers
  * must sample first.
  *
  * Deterministic: seeded Gaussian init + fixed-order sequential arithmetic,
  * so a (input, params, seed) triple always yields the same embedding; the
  * oracled surface still pins verdicts only (KL decreased, extent
  * non-degenerate) because float details are engine-specific by nature. */
object Tsne {

  val MaxRows = 2048

  /** 2-D (or `dims`-D) embedding plus (initial KL, final KL). */
  def fitWithKl(x: Array[Array[Double]], dims: Int = 2,
                perplexity: Double = 30.0, iters: Int = 300,
                learningRate: Double = 200.0, seed: Long = 42L)
      : (Array[Array[Double]], Double, Double) = {
    val n = x.length
    require(n >= 4, s"t-SNE needs at least 4 points, got $n")
    require(n <= MaxRows,
      s"viz-sized input contract: $n > $MaxRows rows — sample upstream")
    require(perplexity < n, "perplexity must be < n")

    // pairwise squared euclidean distances
    val d2 = Array.ofDim[Double](n, n)
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        var s = 0.0
        var k = 0
        val xi = x(i); val xj = x(j)
        while (k < xi.length) { val d = xi(k) - xj(k); s += d * d; k += 1 }
        d2(i)(j) = s; d2(j)(i) = s
        j += 1
      }
      i += 1
    }

    // per-point precision by binary search to the target perplexity
    val logPerp = math.log(perplexity)
    val p = Array.ofDim[Double](n, n)
    i = 0
    while (i < n) {
      var beta = 1.0; var betaMin = 0.0; var betaMax = Double.PositiveInfinity
      var it = 0
      while (it < 50) {
        var sum = 0.0
        var j = 0
        while (j < n) {
          if (j != i) { p(i)(j) = math.exp(-d2(i)(j) * beta); sum += p(i)(j) }
          j += 1
        }
        if (sum <= 0) sum = Double.MinPositiveValue
        var h = 0.0
        j = 0
        while (j < n) {
          if (j != i && p(i)(j) > 0) {
            val pj = p(i)(j) / sum
            h -= pj * math.log(pj)
          }
          j += 1
        }
        val diff = h - logPerp
        if (math.abs(diff) < 1e-5) it = 50
        else {
          if (diff > 0) { betaMin = beta
            beta = if (betaMax.isInfinite) beta * 2 else (beta + betaMax) / 2 }
          else { betaMax = beta; beta = (beta + betaMin) / 2 }
          it += 1
        }
        if (it >= 50) {
          j = 0
          while (j < n) { if (j != i) p(i)(j) /= sum; j += 1 }
        }
      }
      i += 1
    }
    // symmetrize + normalize, floor for numerical stability
    var psum = 0.0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val v = (p(i)(j) + p(j)(i)) / (2.0 * n)
        p(i)(j) = v; p(j)(i) = v; psum += 2 * v
        j += 1
      }
      i += 1
    }
    i = 0
    while (i < n) {
      var j = 0
      while (j < n) {
        p(i)(j) = math.max(p(i)(j) / psum, 1e-12)
        j += 1
      }
      i += 1
    }

    // seeded init
    val rnd = new java.util.Random(seed)
    val y = Array.fill(n, dims)(rnd.nextGaussian() * 1e-4)
    val dy = Array.ofDim[Double](n, dims)
    val gains = Array.fill(n, dims)(1.0)
    val q = Array.ofDim[Double](n, n)

    def computeQ(): Double = {
      var qsum = 0.0
      var a = 0
      while (a < n) {
        var b = a + 1
        while (b < n) {
          var s = 0.0
          var k = 0
          while (k < dims) { val d = y(a)(k) - y(b)(k); s += d * d; k += 1 }
          val num = 1.0 / (1.0 + s)
          q(a)(b) = num; q(b)(a) = num; qsum += 2 * num
          b += 1
        }
        a += 1
      }
      qsum
    }
    def kl(qsum: Double): Double = {
      var s = 0.0
      var a = 0
      while (a < n) {
        var b = 0
        while (b < n) {
          if (a != b) {
            val qv = math.max(q(a)(b) / qsum, 1e-12)
            s += p(a)(b) * math.log(p(a)(b) / qv)
          }
          b += 1
        }
        a += 1
      }
      s
    }

    val kl0 = kl(computeQ())
    val exagIters = math.min(100, iters / 3)
    var iter = 0
    while (iter < iters) {
      val exag = if (iter < exagIters) 4.0 else 1.0
      val momentum = if (iter < 250) 0.5 else 0.8
      val qsum = computeQ()
      var a = 0
      while (a < n) {
        val grad = new Array[Double](dims)
        var b = 0
        while (b < n) {
          if (a != b) {
            val mult = (exag * p(a)(b) - q(a)(b) / qsum) * q(a)(b)
            var k = 0
            while (k < dims) { grad(k) += 4 * mult * (y(a)(k) - y(b)(k)); k += 1 }
          }
          b += 1
        }
        var k = 0
        while (k < dims) {
          gains(a)(k) = math.max(0.01,
            if (math.signum(grad(k)) != math.signum(dy(a)(k)))
              gains(a)(k) + 0.2 else gains(a)(k) * 0.8)
          dy(a)(k) = momentum * dy(a)(k) - learningRate * gains(a)(k) * grad(k)
          k += 1
        }
        a += 1
      }
      var k = 0
      // center after updating every point
      a = 0
      while (a < n) {
        k = 0
        while (k < dims) { y(a)(k) += dy(a)(k); k += 1 }
        a += 1
      }
      val mean = new Array[Double](dims)
      a = 0
      while (a < n) { k = 0; while (k < dims) { mean(k) += y(a)(k) / n; k += 1 }; a += 1 }
      a = 0
      while (a < n) { k = 0; while (k < dims) { y(a)(k) -= mean(k); k += 1 }; a += 1 }
      iter += 1
    }
    val kl1 = kl(computeQ())
    (y, kl0, kl1)
  }

  def fit(x: Array[Array[Double]], dims: Int = 2, perplexity: Double = 30.0,
          iters: Int = 300, learningRate: Double = 200.0,
          seed: Long = 42L): Array[Array[Double]] =
    fitWithKl(x, dims, perplexity, iters, learningRate, seed)._1
}
