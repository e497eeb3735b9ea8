package graft.tools

/** Decomposes the encoder_scale per-layer cost into arithmetic floors:
  * times the session's register-blocked GEMM kernel (replicated verbatim
  * — it is private to OnnxSession) at each matmul shape a BERT-base
  * layer executes at seq 512, plus the transcendental throughput
  * (exp for Softmax, tanh/erf for GELU). Whatever the sum does NOT
  * explain is op-graph overhead (broadcast index math, allocation, data
  * movement) — the next optimization target, measured not guessed.
  */
object GemmProbe {
  // verbatim copy of OnnxSession.mm2T's 2x4 register-blocked kernel
  // (incl. the ~1 MiB L2 column tiling)
  private def mm2T(a: Array[Double], bT: Array[Double],
                   m: Int, k: Int, p: Int, r: Array[Double]): Unit = {
    val tile = math.max(4, ((1 << 20) / (8 * k)) & ~3)
    var jt = 0
    while (jt < p) {
      mm2TTile(a, bT, m, k, p, r, jt, math.min(jt + tile, p))
      jt += tile
    }
  }

  private def mm2TTile(a: Array[Double], bT: Array[Double],
                       m: Int, k: Int, p: Int, r: Array[Double],
                       jStart: Int, jEnd: Int): Unit = {
    var i = 0
    while (i + 2 <= m) {
      val a0 = i * k; val a1 = a0 + k
      var j = jStart
      while (j + 4 <= jEnd) {
        val b0 = j * k; val b1 = b0 + k; val b2 = b1 + k; val b3 = b2 + k
        var s00 = 0.0; var s01 = 0.0; var s02 = 0.0; var s03 = 0.0
        var s10 = 0.0; var s11 = 0.0; var s12 = 0.0; var s13 = 0.0
        var t = 0
        while (t < k) {
          val x0 = a(a0 + t); val x1 = a(a1 + t)
          val y0 = bT(b0 + t); val y1 = bT(b1 + t)
          val y2 = bT(b2 + t); val y3 = bT(b3 + t)
          s00 += x0 * y0; s01 += x0 * y1; s02 += x0 * y2; s03 += x0 * y3
          s10 += x1 * y0; s11 += x1 * y1; s12 += x1 * y2; s13 += x1 * y3
          t += 1
        }
        val o0 = i * p + j; val o1 = o0 + p
        r(o0) = s00; r(o0 + 1) = s01; r(o0 + 2) = s02; r(o0 + 3) = s03
        r(o1) = s10; r(o1 + 1) = s11; r(o1 + 2) = s12; r(o1 + 3) = s13
        j += 4
      }
      while (j < jEnd) {
        val bj = j * k
        var s0 = 0.0; var s1 = 0.0; var t = 0
        while (t < k) {
          val y = bT(bj + t); s0 += a(a0 + t) * y; s1 += a(a1 + t) * y; t += 1
        }
        r(i * p + j) = s0; r((i + 1) * p + j) = s1; j += 1
      }
      i += 2
    }
  }

  // replica of the SESSION kernel's exact signature — ro/ao offsets as
  // runtime values — to measure whether the offset arithmetic defeats
  // HotSpot's range-check elimination vs the offset-free replica above
  private def mm2TTileOff(a: Array[Double], bT: Array[Double],
                          m: Int, k: Int, p: Int, r: Array[Double], ro: Int,
                          ao: Int, jStart: Int, jEnd: Int): Unit = {
    var i = 0
    while (i + 2 <= m) {
      val a0 = ao + i * k; val a1 = a0 + k
      var j = jStart
      while (j + 4 <= jEnd) {
        val b0 = j * k; val b1 = b0 + k; val b2 = b1 + k; val b3 = b2 + k
        var s00 = 0.0; var s01 = 0.0; var s02 = 0.0; var s03 = 0.0
        var s10 = 0.0; var s11 = 0.0; var s12 = 0.0; var s13 = 0.0
        var t = 0
        while (t < k) {
          val x0 = a(a0 + t); val x1 = a(a1 + t)
          val y0 = bT(b0 + t); val y1 = bT(b1 + t)
          val y2 = bT(b2 + t); val y3 = bT(b3 + t)
          s00 += x0 * y0; s01 += x0 * y1; s02 += x0 * y2; s03 += x0 * y3
          s10 += x1 * y0; s11 += x1 * y1; s12 += x1 * y2; s13 += x1 * y3
          t += 1
        }
        val o0 = ro + i * p + j; val o1 = o0 + p
        r(o0) = s00; r(o0 + 1) = s01; r(o0 + 2) = s02; r(o0 + 3) = s03
        r(o1) = s10; r(o1 + 1) = s11; r(o1 + 2) = s12; r(o1 + 3) = s13
        j += 4
      }
      i += 2
    }
  }

  // byte-equal replica of the SESSION's mm2TTile (incl. row/col tails)
  // to bisect the observed session-vs-probe kernel gap
  private def mm2TTileFull(a: Array[Double], bT: Array[Double],
                           m: Int, k: Int, p: Int, r: Array[Double],
                           jStart: Int, jEnd: Int): Unit = {
    var i = 0
    while (i + 2 <= m) {
      val a0 = i * k; val a1 = a0 + k
      var j = jStart
      while (j + 4 <= jEnd) {
        val b0 = j * k; val b1 = b0 + k; val b2 = b1 + k; val b3 = b2 + k
        var s00 = 0.0; var s01 = 0.0; var s02 = 0.0; var s03 = 0.0
        var s10 = 0.0; var s11 = 0.0; var s12 = 0.0; var s13 = 0.0
        var t = 0
        while (t < k) {
          val x0 = a(a0 + t); val x1 = a(a1 + t)
          val y0 = bT(b0 + t); val y1 = bT(b1 + t)
          val y2 = bT(b2 + t); val y3 = bT(b3 + t)
          s00 += x0 * y0; s01 += x0 * y1; s02 += x0 * y2; s03 += x0 * y3
          s10 += x1 * y0; s11 += x1 * y1; s12 += x1 * y2; s13 += x1 * y3
          t += 1
        }
        val o0 = i * p + j; val o1 = o0 + p
        r(o0) = s00; r(o0 + 1) = s01; r(o0 + 2) = s02; r(o0 + 3) = s03
        r(o1) = s10; r(o1 + 1) = s11; r(o1 + 2) = s12; r(o1 + 3) = s13
        j += 4
      }
      while (j < jEnd) {
        val bj = j * k
        var s0 = 0.0; var s1 = 0.0; var t = 0
        while (t < k) {
          val y = bT(bj + t); s0 += a(a0 + t) * y; s1 += a(a1 + t) * y; t += 1
        }
        r(i * p + j) = s0; r((i + 1) * p + j) = s1; j += 1
      }
      i += 2
    }
    while (i < m) {
      val ai = i * k
      var j = jStart
      while (j + 4 <= jEnd) {
        val b0 = j * k; val b1 = b0 + k; val b2 = b1 + k; val b3 = b2 + k
        var s0 = 0.0; var s1 = 0.0; var s2 = 0.0; var s3 = 0.0
        var t = 0
        while (t < k) {
          val x = a(ai + t)
          s0 += x * bT(b0 + t); s1 += x * bT(b1 + t)
          s2 += x * bT(b2 + t); s3 += x * bT(b3 + t)
          t += 1
        }
        val o = i * p + j
        r(o) = s0; r(o + 1) = s1; r(o + 2) = s2; r(o + 3) = s3
        j += 4
      }
      while (j < jEnd) {
        val bj = j * k
        var s = 0.0; var t = 0
        while (t < k) { s += a(ai + t) * bT(bj + t); t += 1 }
        r(i * p + j) = s; j += 1
      }
      i += 1
    }
  }

  private def timeGemmOff(tag: String, m: Int, k: Int, p: Int, reps: Int,
                          off: Int): Double = {
    val a = fill(m * k + off, 1); val bT = fill(k * p, 2)
    val r = new Array[Double](m * p + off)
    val tile = math.max(4, ((1 << 20) / (8 * k)) & ~3)
    def call(): Unit = {
      var jt = 0
      while (jt < p) {
        mm2TTileOff(a, bT, m, k, p, r, off, off, jt, math.min(jt + tile, p))
        jt += tile
      }
    }
    call(); call()
    val t0 = System.nanoTime()
    var q = 0
    while (q < reps) { call(); q += 1 }
    val ms = (System.nanoTime() - t0) / 1e6 / reps
    val gflops = 2.0 * m * k * p / (ms * 1e6)
    println(f"$tag%-28s [$m%4d,$k%4d]x[$k%4d,$p%4d]  $ms%8.1f ms  $gflops%5.2f GFLOP/s")
    ms
  }

  private def fill(n: Int, seed: Int): Array[Double] =
    Array.tabulate(n)(i => ((i * 31 + seed) % 17) * 0.0625 - 0.5)

  // `cold` arg: evict caches between reps (touch 64 MB) and allocate r
  // fresh — the state a GEMM actually runs in mid-graph, where ~100 MB of
  // elementwise traffic separates consecutive matmuls. The hot floor is
  // the L3-resident best case; the session should be judged against cold.
  private var coldMode = false
  private val thrash = new Array[Double](8 << 20)
  private def evict(): Double = {
    var s = 0.0; var i = 0
    while (i < thrash.length) { thrash(i) += 1e-9; s += thrash(i); i += 8 }
    s
  }

  private def timeGemm(tag: String, m: Int, k: Int, p: Int, reps: Int): Double = {
    val a = fill(m * k, 1); val bT = fill(k * p, 2)
    var r = new Array[Double](m * p)
    mm2T(a, bT, m, k, p, r) // warm
    mm2T(a, bT, m, k, p, r)
    var total = 0L
    var q = 0
    while (q < reps) {
      if (coldMode) { evict(); r = new Array[Double](m * p) }
      val t0 = System.nanoTime()
      mm2T(a, bT, m, k, p, r)
      total += System.nanoTime() - t0
      q += 1
    }
    val ms = total / 1e6 / reps
    val gflops = 2.0 * m * k * p / (ms * 1e6)
    println(f"$tag%-28s [$m%4d,$k%4d]x[$k%4d,$p%4d]  $ms%8.1f ms  $gflops%5.2f GFLOP/s")
    ms
  }

  /** `ops` mode: run the BERT-shape layer (same construction as
    * Bench.encoderScaleBench) with GRAFT_ONNX_PROFILE=1 in the
    * environment and print the per-op-type wall breakdown of one
    * seq-512 forward — where the non-GEMM milliseconds actually go. */
  private def opsMode(): Unit = {
    import graft.ml.{OnnxExport, OnnxSession}
    val (s, d, h, f) = (512, 768, 12, 3072)
    val dh = d / h
    def w3(seed: Int): Array[Array[Array[Double]]] =
      Array.tabulate(h, d, dh)((a, i, j) =>
        ((a * 31 + i * 17 + j * 7 + seed) % 9 - 4) * 0.00390625)
    def w2(r: Int, c: Int, seed: Int): Array[Array[Double]] =
      Array.tabulate(r, c)((i, j) => ((i * 13 + j * 11 + seed) % 9 - 4) * 0.00390625)
    def v1(len: Int, seed: Int): Array[Double] =
      Array.tabulate(len)(i => ((i * 5 + seed) % 7 - 3) * 0.015625)
    val layer = OnnxExport.EncoderLayer(
      wq = w3(1), wk = w3(2), wv = w3(3),
      wo = w2(d, d, 4), bo = v1(d, 5),
      g1 = Array.fill(d)(1.0), b1 = v1(d, 6),
      w1 = w2(d, f, 7), bf1 = v1(f, 8),
      w2 = w2(f, d, 9), bf2 = v1(d, 10),
      g2 = Array.fill(d)(1.0), b2 = v1(d, 11))
    val stack = OnnxExport.EncoderStack(s, d, h, f, Seq(layer),
      wHead = v1(d, 12), bHead = 0.125,
      attScale = 1.0 / math.sqrt(dh.toDouble), lnEps = 1e-5)
    val path = "/tmp/graft_probe_encoder_512.onnx"
    OnnxExport.exportEncoderStack(stack, path)
    val sess = OnnxSession.load(path)
    val doc = Array.tabulate(1, s * d)((r, i) => ((r * 31 + i) % 17) * 0.0625 - 0.5)
    sess.run(doc) // warm (JIT, transposed-weight cache)
    sess.run(doc)
    // min-of-3 with the profile snapshot taken around the FASTEST run:
    // single-run wall on this box swings ±30%
    var wallMs = Double.MaxValue
    var before = sess.opProfileNanos
    var after = before
    for (_ <- 1 to 3) {
      val b0 = sess.opProfileNanos
      val t0 = System.nanoTime()
      sess.run(doc)
      val w = (System.nanoTime() - t0) / 1e6
      if (w < wallMs) { wallMs = w; before = b0; after = sess.opProfileNanos }
    }
    if (after.isEmpty) {
      println("op profile empty — run with GRAFT_ONNX_PROFILE=1"); return
    }
    val delta = after.map { case (k, v) => k -> (v - before.getOrElse(k, 0L)) }
    println(f"== per-op wall, one seq-512 layer forward (total $wallMs%.0f ms) ==")
    delta.toSeq.sortBy(-_._2).foreach { case (op, ns) =>
      println(f"$op%-18s ${ns / 1e6}%8.1f ms  ${100.0 * ns / (wallMs * 1e6)}%5.1f%%")
    }
  }

  /** `sess` mode: ONE MatMul+Add (a 768→3072 linear map over a 512-row
    * batch — the exact ffn-up shape) through the full OnnxSession, timed
    * per run. Bisects "session f0 is 1.6× the kernel floor" into
    * kernel-in-session vs graph-context (GC from neighboring ops). */
  private def sessMode(): Unit = {
    import graft.ml.{OnnxExport, OnnxSession}
    val (rows, kIn, pOut) = (512, 768, 3072)
    val w = Array.tabulate(kIn, pOut)((i, j) => ((i * 13 + j * 11) % 9 - 4) * 0.00390625)
    val bias = Array.tabulate(pOut)(i => ((i * 5) % 7 - 3) * 0.015625)
    val path = "/tmp/graft_probe_linear.onnx"
    OnnxExport.exportLinearMap(w, bias, (0 until kIn).map(i => s"f$i"), path)
    val sess = OnnxSession.load(path)
    val batch = Array.tabulate(rows, kIn)((r, i) => ((r * 31 + i) % 17) * 0.0625 - 0.5)
    sess.runMatrix(batch); sess.runMatrix(batch) // warm
    for (q <- 1 to 4) {
      val before = sess.opProfileNanos
      val t0 = System.nanoTime()
      sess.runMatrix(batch)
      val wall = (System.nanoTime() - t0) / 1e6
      val mm = (sess.opProfileNanos.getOrElse("MatMul", 0L) -
        before.getOrElse("MatMul", 0L)) / 1e6
      println(f"session linear run $q: $wall%.1f ms (MatMul $mm%.1f ms)")
    }
  }

  def main(args: Array[String]): Unit = {
    if (args.contains("ops")) { opsMode(); return }
    if (args.contains("sess")) { sessMode(); return }
    if (args.contains("off")) {
      timeGemmOff("ffn-up off=0", 512, 768, 3072, 4, 0)
      timeGemmOff("ffn-up off=args.len", 512, 768, 3072, 4, args.length - 1)
      return
    }
    if (args.contains("full")) { // session-identical kernel incl. tails
      val (m, k, p) = (512, 768, 3072)
      val a = fill(m * k, 1); val bT = fill(k * p, 2)
      val r = new Array[Double](m * p)
      val tile = math.max(4, ((1 << 20) / (8 * k)) & ~3)
      def call(): Unit = {
        var jt = 0
        while (jt < p) {
          mm2TTileFull(a, bT, m, k, p, r, jt, math.min(jt + tile, p)); jt += tile
        }
      }
      call(); call()
      for (q <- 1 to 4) {
        val t0 = System.nanoTime()
        call()
        println(f"full-replica ffn-up run $q: ${(System.nanoTime() - t0) / 1e6}%.1f ms")
      }
      return
    }
    coldMode = args.contains("cold")
    if (coldMode) println("(cold mode: caches evicted between reps)")
    val (s, d, h, f) = (512, 768, 12, 3072)
    val dh = d / h
    println("== per-layer matmul floors (seq 512, BERT-base) ==")
    // Q/K/V projections: 3 x h per-head [s,d]x[d,dh]
    val qkv = timeGemm("qkv per-head", s, d, dh, 6) * 3 * h
    // QK^T per head: [s,dh]x[dh,s]
    val qkT = timeGemm("QK^T per-head", s, dh, s, 6) * h
    // attn*V per head: [s,s]x[s,dh]
    val av = timeGemm("attn*V per-head", s, s, dh, 6) * h
    // output projection [s,d]x[d,d]
    val op = timeGemm("out-proj", s, d, d, 4)
    // FFN up [s,d]x[d,f] and down [s,f]x[f,d]
    val f1 = timeGemm("ffn-up", s, d, f, 2)
    val f2 = timeGemm("ffn-down", s, f, d, 2)
    val gemmTotal = qkv + qkT + av + op + f1 + f2
    println(f"GEMM floor per layer-doc: ${gemmTotal}%8.1f ms")
    // transcendental floors
    val n1 = h * s * s; val xs = fill(4096, 3)
    var acc = 0.0
    var i = 0; while (i < n1) { acc += math.exp(xs(i & 4095) - 1.0); i += 1 } // warm
    var t0 = System.nanoTime()
    i = 0; while (i < n1) { acc += math.exp(xs(i & 4095) - 1.0); i += 1 }
    val expMs = (System.nanoTime() - t0) / 1e6
    val n2 = s * f
    t0 = System.nanoTime()
    i = 0; while (i < n2) { acc += math.tanh(xs(i & 4095)); i += 1 }
    val tanhMs = (System.nanoTime() - t0) / 1e6
    println(f"softmax exp (${n1} vals): $expMs%6.1f ms   gelu tanh (${n2} vals): $tanhMs%6.1f ms   [sink $acc%.2f]")
    println(f"explained floor: ${gemmTotal + expMs + tanhMs}%8.1f ms per layer-doc")
  }
}
