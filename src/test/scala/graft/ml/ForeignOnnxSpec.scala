package graft.ml

import org.scalatest.funsuite.AnyFunSuite

/** Proves [[OnnxSession]] executes model files it did NOT write: the
  * fixture bytes here come from an INDEPENDENT protobuf writer (a
  * streaming ByteArrayOutputStream builder typed directly from the public
  * onnx.proto field numbers — no code shared with [[graft.ml.Proto]]'s
  * array-concat writer), and the graph uses the plumbing ops a real
  * `torch.onnx.export` emits around the compute graph — Shape, Expand,
  * Where, Equal, Cast-to-bool, ConstantOfShape, Constant nodes, Identity,
  * inference Dropout (both output arities) — plus the exact-GELU
  * Div→Erf→Add→Mul→Mul shape torch writes for `nn.GELU()`. Expected
  * values are hand-loop recomputed in this spec.
  */
class ForeignOnnxSpec extends AnyFunSuite {

  // ---- an independent ONNX protobuf writer (streaming, not concat) ----
  private object Pb {
    import java.io.ByteArrayOutputStream
    type B = ByteArrayOutputStream
    def vint(o: B, v: Long): Unit = {
      var x = v
      while ((x & ~0x7fL) != 0) { o.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      o.write((x & 0x7f).toInt)
    }
    def key(o: B, field: Int, wire: Int): Unit = vint(o, (field.toLong << 3) | wire)
    def int(o: B, field: Int, v: Long): Unit = { key(o, field, 0); vint(o, v) }
    def bytes(o: B, field: Int, b: Array[Byte]): Unit = {
      key(o, field, 2); vint(o, b.length.toLong); o.write(b)
    }
    def str(o: B, field: Int, s: String): Unit = bytes(o, field, s.getBytes("UTF-8"))
    def msg(f: B => Unit): Array[Byte] = { val o = new B; f(o); o.toByteArray }

    /** TensorProto with DOUBLE raw_data (field 9) — the layout this
      * repo's own writer never uses for doubles (it packs field 10). */
    def doubleTensor(name: String, dims: Seq[Long], data: Seq[Double]): Array[Byte] =
      msg { o =>
        val dimsB = msg(d => dims.foreach(vint(d, _)))
        if (dims.nonEmpty) bytes(o, 1, dimsB)
        int(o, 2, 11) // data_type DOUBLE
        val raw = java.nio.ByteBuffer.allocate(data.length * 8)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        data.foreach(raw.putDouble)
        bytes(o, 9, raw.array())
        if (name.nonEmpty) str(o, 8, name)
      }
    /** TensorProto with FLOAT raw_data (ConstantOfShape's fill value). */
    def floatTensor(dims: Seq[Long], data: Seq[Float]): Array[Byte] =
      msg { o =>
        val dimsB = msg(d => dims.foreach(vint(d, _)))
        if (dims.nonEmpty) bytes(o, 1, dimsB)
        int(o, 2, 1) // data_type FLOAT
        val raw = java.nio.ByteBuffer.allocate(data.length * 4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        data.foreach(raw.putFloat)
        bytes(o, 9, raw.array())
      }
    /** TensorProto with BOOL raw_data — ONE byte per element, the layout
      * torch writes for bool constants (attention-mask paths). */
    def boolTensor(dims: Seq[Long], data: Seq[Boolean]): Array[Byte] =
      msg { o =>
        val dimsB = msg(d => dims.foreach(vint(d, _)))
        if (dims.nonEmpty) bytes(o, 1, dimsB)
        int(o, 2, 9) // data_type BOOL
        bytes(o, 9, data.map(b => if (b) 1.toByte else 0.toByte).toArray)
      }
    def fixed32(o: B, field: Int, bits: Int): Unit = {
      key(o, field, 5)
      o.write(bits & 0xff); o.write((bits >> 8) & 0xff)
      o.write((bits >> 16) & 0xff); o.write((bits >>> 24) & 0xff)
    }
    def attrInt(name: String, v: Long): Array[Byte] =
      msg { o => str(o, 1, name); int(o, 20, 2); int(o, 3, v) }
    def attrFloat(name: String, v: Float): Array[Byte] =
      msg { o => str(o, 1, name); int(o, 20, 1)
        fixed32(o, 2, java.lang.Float.floatToIntBits(v)) }
    /** INTS attribute written UNPACKED (repeated field-8 varints) — the
      * wire form proto2 writers emit, exercising the reader's unpacked
      * path. */
    def attrIntList(name: String, vs: Seq[Long]): Array[Byte] =
      msg { o => str(o, 1, name); int(o, 20, 7); vs.foreach(int(o, 8, _)) }
    def attrTensor(name: String, t: Array[Byte]): Array[Byte] =
      msg { o => str(o, 1, name); int(o, 20, 4); bytes(o, 5, t) }
    /** STRING attribute (AttributeProto.s, field 4, type 3) — the form
      * the fused Gelu op's `approximate` arrives in. */
    def attrStr(name: String, v: String): Array[Byte] =
      msg { o => str(o, 1, name); int(o, 20, 3); str(o, 4, v) }
    /** TensorProto with packed INT64 int64_data (field 7) — axes inputs. */
    def i64Tensor(name: String, dims: Seq[Long], data: Seq[Long]): Array[Byte] =
      msg { o =>
        val dimsB = msg(d => dims.foreach(vint(d, _)))
        if (dims.nonEmpty) bytes(o, 1, dimsB)
        int(o, 2, 7) // data_type INT64
        bytes(o, 7, msg(p => data.foreach(vint(p, _))))
        if (name.nonEmpty) str(o, 8, name)
      }
    def node(op: String, ins: Seq[String], outs: Seq[String],
             attrs: Seq[Array[Byte]] = Nil): Array[Byte] =
      msg { o =>
        ins.foreach(str(o, 1, _))
        outs.foreach(str(o, 2, _))
        str(o, 4, op)
        attrs.foreach(bytes(o, 5, _))
      }
    def valueInfo(name: String, dims: Seq[Option[Long]]): Array[Byte] =
      msg { o =>
        str(o, 1, name)
        val shape = msg { sh =>
          dims.foreach { d =>
            bytes(sh, 1, msg { dm =>
              d match {
                case Some(v) => int(dm, 1, v)
                case None    => str(dm, 2, "N")
              }
            })
          }
        }
        bytes(o, 2, msg(tt => bytes(tt, 1,
          msg { t => int(t, 1, 11); bytes(t, 2, shape) })))
      }
    def model(nodes: Seq[Array[Byte]], inits: Seq[Array[Byte]],
              input: Array[Byte], output: Array[Byte]): Array[Byte] =
      msg { o =>
        int(o, 1, 8) // ir_version
        str(o, 2, "not-graft") // producer: this writer is NOT the engine's
        bytes(o, 7, msg { g =>
          nodes.foreach(bytes(g, 1, _))
          str(g, 2, "foreign_graph")
          inits.foreach(bytes(g, 5, _))
          bytes(g, 11, input)
          bytes(g, 12, output)
        })
        bytes(o, 8, msg(op => int(op, 2, 13)))
      }
  }

  /** The fixture graph: x [N,3] →
    * shp=Shape(x); twos=ConstantOfShape(shp, 2.0f);
    * half=Constant(0.5); eq=Equal(x,twos); eqb=Cast(eq,BOOL);
    * sel=Where(eqb, half, x)  — 0.5 where x==2, else x;
    * idn=Identity(sel); (drp,msk)=Dropout(idn); dm=Mul(drp,msk);
    * exact GELU: dv=Div(dm,√2); er=Erf(dv); ad=Add(er,1); ml=Mul(dm,ad);
    * g=Mul(ml,half); hx=Expand(half,shp); y=Add(g,hx). */
  private def foreignModel: Array[Byte] = {
    import Pb._
    val nodes = Seq(
      node("Shape", Seq("x"), Seq("shp")),
      node("ConstantOfShape", Seq("shp"), Seq("twos"),
        Seq(attrTensor("value", floatTensor(Seq(1L), Seq(2.0f))))),
      node("Constant", Nil, Seq("half"),
        Seq(attrTensor("value", doubleTensor("", Seq(1L), Seq(0.5))))),
      node("Constant", Nil, Seq("one"),
        Seq(attrTensor("value", doubleTensor("", Seq(1L), Seq(1.0))))),
      node("Constant", Nil, Seq("sqrt2"),
        Seq(attrTensor("value", doubleTensor("", Seq(1L), Seq(1.4142135623730951))))),
      node("Equal", Seq("x", "twos"), Seq("eq")),
      node("Cast", Seq("eq"), Seq("eqb"), Seq(attrInt("to", 9L))),
      node("Where", Seq("eqb", "half", "x"), Seq("sel")),
      node("Identity", Seq("sel"), Seq("idn")),
      node("Dropout", Seq("idn"), Seq("drp", "msk")),
      node("Mul", Seq("drp", "msk"), Seq("dm")),
      node("Div", Seq("dm", "sqrt2"), Seq("dv")),
      node("Erf", Seq("dv"), Seq("er")),
      node("Add", Seq("er", "one"), Seq("ad")),
      node("Mul", Seq("dm", "ad"), Seq("ml")),
      node("Mul", Seq("ml", "half"), Seq("g")),
      node("Expand", Seq("half", "shp"), Seq("hx")),
      node("Add", Seq("g", "hx"), Seq("y")))
    model(nodes, inits = Nil,
      input = valueInfo("x", Seq(None, Some(3L))),
      output = valueInfo("y", Seq(None, Some(3L))))
  }

  /** The session's erf formula (Abramowitz & Stegun 7.1.26), retyped
    * here from the public formula — the expected-value reference. */
  private def erfAs(x: Double): Double = {
    val t = 1.0 / (1.0 + 0.3275911 * math.abs(x))
    val y = 1.0 - (((((1.061405429 * t - 1.453152027) * t) + 1.421413741) *
      t - 0.284496736) * t + 0.254829592) * t * math.exp(-x * x)
    if (x >= 0) y else -y
  }

  private def expectedRow(row: Array[Double]): Array[Double] = row.map { v =>
    val sel = if (v == 2.0) 0.5 else v
    val gelu = sel * (erfAs(sel / 1.4142135623730951) + 1.0) * 0.5
    gelu + 0.5
  }

  test("session executes a model written by a foreign byte-level writer " +
    "(Shape/ConstantOfShape/Constant/Equal/Where/Identity/Dropout/Expand + exact GELU)") {
    val sess = new OnnxSession(foreignModel)
    assert(sess.inputNames === Seq("x"))
    val batch = Array(
      Array(2.0, -1.0, 0.25),
      Array(0.5, 2.0, 3.0),
      Array(-2.5, 0.0, 2.0))
    val out = sess.runMatrix(batch)
    assert(out.length === 3)
    batch.zip(out).foreach { case (in, got) =>
      val exp = expectedRow(in)
      got.zip(exp).foreach { case (g, e) =>
        assert(math.abs(g - e) < 1e-12, s"row ${in.mkString(",")}: $g vs $e")
      }
    }
  }

  test("exact GELU through the session tracks true GELU within the erf " +
    "approximation's documented 1.5e-7 band") {
    val sess = new OnnxSession(foreignModel)
    val zs = Array(Array(0.1, -0.7, 1.3))
    val out = sess.runMatrix(zs)(0)
    zs(0).zip(out).foreach { case (z, got) =>
      val trueGelu = 0.5 * z * (1.0 + org.apache.commons.math3.special.Erf.erf(z / math.sqrt(2.0)))
      assert(math.abs(got - 0.5 - trueGelu) < 2e-7 * math.max(1.0, math.abs(z)))
    }
  }

  test("Dropout with training_mode=true fails loudly") {
    import Pb._
    val m = model(
      Seq(
        node("Constant", Nil, Seq("tm"),
          Seq(attrTensor("value", doubleTensor("", Seq(1L), Seq(1.0))))),
        node("Constant", Nil, Seq("ratio"),
          Seq(attrTensor("value", doubleTensor("", Seq(1L), Seq(0.5))))),
        node("Dropout", Seq("x", "ratio", "tm"), Seq("y"))),
      inits = Nil,
      input = valueInfo("x", Seq(None, Some(2L))),
      output = valueInfo("y", Seq(None, Some(2L))))
    val sess = new OnnxSession(m)
    val e = intercept[IllegalArgumentException] {
      sess.runMatrix(Array(Array(1.0, 2.0)))
    }
    assert(e.getMessage.contains("training_mode"))
  }

  test("BOOL tensors arrive as raw_data (1 byte/element) and select in Where") {
    import Pb._
    // c = [true, false, true] as a bool raw_data Constant;
    // y = Where(c, x, tenth) — x where c, 0.1 elsewhere
    val m = model(
      Seq(
        node("Constant", Nil, Seq("c"),
          Seq(attrTensor("value", boolTensor(Seq(3L), Seq(true, false, true))))),
        node("Constant", Nil, Seq("tenth"),
          Seq(attrTensor("value", doubleTensor("", Seq(1L), Seq(0.1))))),
        node("Where", Seq("c", "x", "tenth"), Seq("y"))),
      inits = Nil,
      input = valueInfo("x", Seq(None, Some(3L))),
      output = valueInfo("y", Seq(None, Some(3L))))
    val out = new OnnxSession(m).runMatrix(Array(Array(7.0, 8.0, 9.0)))
    assert(out(0).toSeq === Seq(7.0, 0.1, 9.0))
  }

  test("BOOL initializer (graph-level) decodes from raw_data too") {
    import Pb._
    // same select, but the bool tensor is a graph INITIALIZER — the
    // torch-export layout the session's initializer parse must accept
    val init = msg { o =>
      bytes(o, 1, msg(d => vint(d, 3L)))
      int(o, 2, 9)
      bytes(o, 9, Array[Byte](1, 0, 1))
      str(o, 8, "c")
    }
    val m = model(
      Seq(
        node("Constant", Nil, Seq("tenth"),
          Seq(attrTensor("value", doubleTensor("", Seq(1L), Seq(0.1))))),
        node("Where", Seq("c", "x", "tenth"), Seq("y"))),
      inits = Seq(init),
      input = valueInfo("x", Seq(None, Some(3L))),
      output = valueInfo("y", Seq(None, Some(3L))))
    val out = new OnnxSession(m).runMatrix(Array(Array(7.0, 8.0, 9.0)))
    assert(out(0).toSeq === Seq(7.0, 0.1, 9.0))
  }

  test("Constant scalar attribute forms: value_float, value_int, value_ints") {
    import Pb._
    // f = 0.25 (value_float, 0-d); i = 3 (value_int, 0-d);
    // shp = [3] (value_ints); ones = ConstantOfShape(shp, 1.0);
    // y = x·f + i·ones  → x·0.25 + 3.0
    val m = model(
      Seq(
        node("Constant", Nil, Seq("f"), Seq(attrFloat("value_float", 0.25f))),
        node("Constant", Nil, Seq("i"), Seq(attrInt("value_int", 3L))),
        node("Constant", Nil, Seq("shp"), Seq(attrIntList("value_ints", Seq(3L)))),
        node("ConstantOfShape", Seq("shp"), Seq("ones"),
          Seq(attrTensor("value", doubleTensor("", Seq(1L), Seq(1.0))))),
        node("Mul", Seq("x", "f"), Seq("xf")),
        node("Mul", Seq("i", "ones"), Seq("io")),
        node("Add", Seq("xf", "io"), Seq("y"))),
      inits = Nil,
      input = valueInfo("x", Seq(None, Some(3L))),
      output = valueInfo("y", Seq(None, Some(3L))))
    val out = new OnnxSession(m).runMatrix(Array(Array(4.0, 8.0, -4.0)))
    assert(out(0).toSeq === Seq(4.0, 5.0, 2.0))
  }

  test("Shape start/end slices the dim list (opset 15 form)") {
    import Pb._
    // y = ConstantOfShape(Shape(x, start=1), 3.0) → [3] of 3.0 regardless of N
    val m = model(
      Seq(
        node("Shape", Seq("x"), Seq("s1"), Seq(attrInt("start", 1L))),
        node("ConstantOfShape", Seq("s1"), Seq("y"),
          Seq(attrTensor("value", doubleTensor("", Seq(1L), Seq(3.0)))))),
      inits = Nil,
      input = valueInfo("x", Seq(None, Some(3L))),
      output = valueInfo("y", Seq(Some(3L))))
    val sess = new OnnxSession(m)
    val out = sess.runMatrix(Array(Array(9.0, 9.0, 9.0)))
    assert(out.flatten.toSeq === Seq(3.0, 3.0, 3.0))
  }

  /** The session's tanh-GELU constants, retyped from the public formula. */
  private def geluTanh(z: Double): Double =
    0.5 * z * (1.0 + math.tanh(0.7978845608028654 * (z + 0.044715 * z * z * z)))
  private def geluExact(z: Double): Double =
    0.5 * z * (1.0 + erfAs(z / 1.4142135623730951))

  test("position-id and mask ops a RoBERTa-class export emits: " +
    "Range/CumSum/Less/Greater/Neg/Squeeze + fused Gelu (both modes)") {
    import Pb._
    // y = Gelu(x) + Gelu_tanh(x) + CumSum(x, axis=1) + (x < pos) +
    //     (x > pos) + (−x) + Squeeze(Unsqueeze(x, [0]), [0])
    // with pos = Range(0, 4, 1) broadcast over the trailing axis
    val m = model(
      Seq(
        node("Range", Seq("rs", "rl", "rd"), Seq("pos")),
        node("CumSum", Seq("x", "axc"), Seq("cs")),
        node("Less", Seq("x", "pos"), Seq("lt")),
        node("Greater", Seq("x", "pos"), Seq("gt")),
        node("Neg", Seq("x"), Seq("ng")),
        node("Unsqueeze", Seq("x", "sqax"), Seq("ux")),
        node("Squeeze", Seq("ux", "sqax"), Seq("sq")),
        node("Gelu", Seq("x"), Seq("ge")), // default approximate='none'
        node("Gelu", Seq("x"), Seq("gt2"), Seq(attrStr("approximate", "tanh"))),
        node("Add", Seq("ge", "gt2"), Seq("t1")),
        node("Add", Seq("t1", "cs"), Seq("t2")),
        node("Add", Seq("t2", "lt"), Seq("t3")),
        node("Add", Seq("t3", "gt"), Seq("t4")),
        node("Add", Seq("t4", "ng"), Seq("t5")),
        node("Add", Seq("t5", "sq"), Seq("y"))),
      inits = Seq(
        doubleTensor("rs", Nil, Seq(0.0)),
        doubleTensor("rl", Nil, Seq(4.0)),
        doubleTensor("rd", Nil, Seq(1.0)),
        i64Tensor("axc", Seq(1L), Seq(1L)),
        i64Tensor("sqax", Seq(1L), Seq(0L))),
      input = valueInfo("x", Seq(None, Some(4L))),
      output = valueInfo("y", Seq(None, Some(4L))))
    val sess = new OnnxSession(m)
    val batch = Array(
      Array(0.5, -1.25, 2.0, 3.5),
      Array(-0.75, 0.0, 1.0, -2.0))
    val out = sess.runMatrix(batch)
    batch.zip(out).foreach { case (row, got) =>
      var running = 0.0
      row.zipWithIndex.zip(got).foreach { case ((v, j), g) =>
        running += v
        val e = geluExact(v) + geluTanh(v) + running +
          (if (v < j) 1.0 else 0.0) + (if (v > j) 1.0 else 0.0) + (-v) + v
        assert(math.abs(g - e) < 1e-12,
          s"col $j of row ${row.mkString(",")}: $g vs $e")
      }
    }
  }

  test("CumSum refuses exclusive/reverse loudly; Range with negative delta") {
    import Pb._
    val bad = model(
      Seq(node("CumSum", Seq("x", "axc"), Seq("y"),
        Seq(attrInt("exclusive", 1L)))),
      inits = Seq(i64Tensor("axc", Seq(1L), Seq(1L))),
      input = valueInfo("x", Seq(None, Some(4L))),
      output = valueInfo("y", Seq(None, Some(4L))))
    val ex = intercept[Exception] {
      new OnnxSession(bad).runMatrix(Array(Array(1.0, 2.0, 3.0, 4.0)))
    }
    assert(ex.getMessage.contains("CumSum"))
    // Range counts down with a negative delta
    val down = model(
      Seq(
        node("Range", Seq("rs", "rl", "rd"), Seq("pos")),
        node("Add", Seq("x", "pos"), Seq("y"))),
      inits = Seq(
        doubleTensor("rs", Nil, Seq(3.0)),
        doubleTensor("rl", Nil, Seq(-1.0)),
        doubleTensor("rd", Nil, Seq(-1.0))),
      input = valueInfo("x", Seq(None, Some(4L))),
      output = valueInfo("y", Seq(None, Some(4L))))
    val out = new OnnxSession(down).runMatrix(Array(Array(0.0, 0.0, 0.0, 0.0)))
    assert(out(0).toSeq === Seq(3.0, 2.0, 1.0, 0.0))
  }
}
