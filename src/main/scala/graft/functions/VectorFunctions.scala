package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for vector math over ArrayType(FloatType)
  * embedding columns.
  *
  * WHY: Spark's higher-order functions (`zip_with` + `aggregate`) are
  * correct but run interpreted (LambdaFunction bodies don't participate in
  * whole-stage codegen) and allocate an intermediate 64-element array per
  * row-pair. On the all-pairs similarity search (q32: 2M pairs at sf0.1)
  * that cost 62 s. These expressions generate a tight scalar loop over the
  * two ArrayData buffers — no allocation, stays inside WholeStageCodegen —
  * and produce BIT-IDENTICAL results to the higher-order formulation
  * (same sequential left-to-right double accumulation), so oracle parity
  * is unaffected.
  *
  * At 100 TB this is the building block for both brute-force scoring and
  * the LSH-bucketed variant (bucket-local pair scoring).
  */
object VectorFunctions {

  /** Fold over two float arrays: Σ CAST(a[i] AS DOUBLE) * CAST(b[i] AS DOUBLE). */
  case class FloatVectorDot(left: Expression, right: Expression)
      extends BinaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      if (children.forall(_.dataType.isInstanceOf[ArrayType]) &&
          children.forall(_.dataType.asInstanceOf[ArrayType].elementType == FloatType))
        TypeCheckResult.TypeCheckSuccess
      else
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two ARRAY<FLOAT> arguments, got " +
            children.map(_.dataType.catalogString).mkString(", "))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_dot"

    // NULL semantics match the zip_with/aggregate formulation exactly:
    // mismatched lengths (zip_with pads with null) or a null element
    // poison the sum → NULL, same as the DuckDB manual-DOUBLE oracle.
    override def nullable: Boolean = true

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements()) return null
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = $a.numElements();
           |double $acc = 0.0;
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
           |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
           |  }
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Σ CAST(a[i] AS DOUBLE)² — squared L2 norm (sqrt on top where needed). */
  case class FloatVectorNormSq(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an ARRAY<FLOAT> argument, got ${other.catalogString}")
      }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_norm_sq"

    // a null element poisons the sum → NULL (matches the HOF formulation)
    override def nullable: Boolean = true

    override protected def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val n = x.numElements()
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i)) return null
        val v = x.getFloat(i).toDouble
        acc += v * v
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        val v = ctx.freshName("v")
        s"""
           |int $n = $a.numElements();
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
           |  double $v = (double) $a.getFloat($i);
           |  $acc += $v * $v;
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Full random-hyperplane LSH signature in ONE expression:
    * `vec_lsh(vec, planes, bits, tables)` → ARRAY<INT> of `tables` packed
    * sign-bit signatures, where `planes` is a single flat literal of
    * tables×bits×dim floats (plane (t,p) occupies [((t·bits)+p)·dim, +dim)).
    *
    * WHY one expression instead of bits×tables `when(vec_dot(...) >= 0)`
    * columns: with 64 planes the per-column formulation builds a 64-subtree
    * projection whose whole-stage-codegen source takes ~1.3 s to
    * janino-compile per stage — measured 4× the actual execution time on an
    * sf0.1 corpus, and the self-join in the near-dup pipeline pays it on
    * both sides. This node emits one tight triple loop (tables × bits ×
    * dim) over two ArrayData buffers; codegen size is constant in
    * bits×tables. Per-plane accumulation is left-to-right double FMA —
    * bit-identical bucket assignments to the vec_dot formulation.
    *
    * NULL semantics match `when(vec_dot(v, plane) >= 0, 1<<p).otherwise(0)`:
    * a NULL vector → NULL result; a NULL *element* poisons every dot → no
    * bit set → all-zero signatures; a planes/dim length mismatch → NULL.
    */
  case class FloatLshSignature(left: Expression, right: Expression,
                               bits: Int, tables: Int)
      extends BinaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      if (children.forall(_.dataType.isInstanceOf[ArrayType]) &&
          children.forall(_.dataType.asInstanceOf[ArrayType].elementType == FloatType)) {
        if (bits >= 1 && bits <= 30 && tables >= 1) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires 1 <= bits <= 30 and tables >= 1, got bits=$bits tables=$tables")
      } else
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires ARRAY<FLOAT> vec and planes arguments, got " +
            children.map(_.dataType.catalogString).mkString(", "))
    override def dataType: DataType =
      ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
    override def prettyName: String = "vec_lsh"
    override def nullable: Boolean = true

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val planes = b.asInstanceOf[ArrayData]
      val dim = x.numElements()
      if (planes.numElements() != tables * bits * dim) return null
      val out = new Array[Int](tables)
      var hasNull = false
      var d = 0
      while (d < dim && !hasNull) { hasNull = x.isNullAt(d); d += 1 }
      if (!hasNull) {
        var off = 0
        var t = 0
        while (t < tables) {
          var sig = 0
          var p = 0
          while (p < bits) {
            var acc = 0.0
            var i = 0
            while (i < dim) {
              acc += x.getFloat(i).toDouble * planes.getFloat(off + i).toDouble
              i += 1
            }
            off += dim
            if (acc >= 0.0) sig |= (1 << p)
            p += 1
          }
          out(t) = sig
          t += 1
        }
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val dim = ctx.freshName("dim")
        val out = ctx.freshName("out")
        val hasNull = ctx.freshName("hasNull")
        val off = ctx.freshName("off")
        val t = ctx.freshName("t")
        val p = ctx.freshName("p")
        val i = ctx.freshName("i")
        val d = ctx.freshName("d")
        val acc = ctx.freshName("acc")
        val sig = ctx.freshName("sig")
        s"""
           |int $dim = $a.numElements();
           |if ($b.numElements() != ${tables * bits} * $dim) {
           |  ${ev.isNull} = true;
           |} else {
           |  int[] $out = new int[$tables];
           |  boolean $hasNull = false;
           |  for (int $d = 0; $d < $dim && !$hasNull; $d++) $hasNull = $a.isNullAt($d);
           |  if (!$hasNull) {
           |    int $off = 0;
           |    for (int $t = 0; $t < $tables; $t++) {
           |      int $sig = 0;
           |      for (int $p = 0; $p < $bits; $p++) {
           |        double $acc = 0.0;
           |        for (int $i = 0; $i < $dim; $i++) {
           |          $acc += (double) $a.getFloat($i) * (double) $b.getFloat($off + $i);
           |        }
           |        $off += $dim;
           |        if ($acc >= 0.0) $sig |= (1 << $p);
           |      }
           |      $out[$t] = $sig;
           |    }
           |  }
           |  ${ev.value} =
           |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** `vec_lsh_probe(vec, planes, bits, tables, nprobe)` → ARRAY<INT> of
    * `tables * (1 + nprobe)` buckets: per table, the base signature
    * followed by `nprobe` MULTI-PROBE buckets — the signature with a
    * lowest-|margin| bit flipped, one bit per probe, in ascending margin
    * order. The margin |dot(vec, plane)| measures how close the vector
    * sits to each hyperplane; a near neighbour that lands one bucket
    * over almost always differs in a minimal-margin bit, so probing
    * exactly those flips recovers most Hamming-1 misses far cheaper than
    * adding tables (Lv et al.'s multi-probe LSH as a codegen'd kernel,
    * so probing stays in-plan). Same flat plane layout and null
    * semantics as `vec_lsh`.
    */
  case class FloatLshMultiProbe(left: Expression, right: Expression,
                                bits: Int, tables: Int, nprobe: Int)
      extends BinaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      if (children.forall(_.dataType.isInstanceOf[ArrayType]) &&
          children.forall(_.dataType.asInstanceOf[ArrayType].elementType == FloatType)) {
        if (bits >= 1 && bits <= 30 && tables >= 1 && nprobe >= 0 && nprobe <= bits)
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires 1 <= bits <= 30, tables >= 1, 0 <= nprobe <= bits, " +
          s"got bits=$bits tables=$tables nprobe=$nprobe")
      } else
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires ARRAY<FLOAT> vec and planes arguments, got " +
            children.map(_.dataType.catalogString).mkString(", "))
    override def dataType: DataType =
      ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
    override def prettyName: String = "vec_lsh_probe"
    override def nullable: Boolean = true

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val planes = b.asInstanceOf[ArrayData]
      val dim = x.numElements()
      if (planes.numElements() != tables * bits * dim) return null
      val stride = 1 + nprobe
      val out = new Array[Int](tables * stride)
      var hasNull = false
      var d = 0
      while (d < dim && !hasNull) { hasNull = x.isNullAt(d); d += 1 }
      if (!hasNull) {
        val margins = new Array[Double](bits)
        val used = new Array[Boolean](bits)
        var off = 0
        var t = 0
        while (t < tables) {
          var sig = 0
          var p = 0
          while (p < bits) {
            var acc = 0.0
            var i = 0
            while (i < dim) {
              acc += x.getFloat(i).toDouble * planes.getFloat(off + i).toDouble
              i += 1
            }
            off += dim
            if (acc >= 0.0) sig |= (1 << p)
            margins(p) = if (acc < 0.0) -acc else acc
            p += 1
          }
          out(t * stride) = sig
          java.util.Arrays.fill(used, false)
          var j = 0
          while (j < nprobe) {
            var best = -1
            var bestM = Double.MaxValue
            var q = 0
            while (q < bits) {
              if (!used(q) && margins(q) < bestM) { best = q; bestM = margins(q) }
              q += 1
            }
            used(best) = true
            out(t * stride + 1 + j) = sig ^ (1 << best)
            j += 1
          }
          t += 1
        }
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val dim = ctx.freshName("dim")
        val out = ctx.freshName("out")
        val hasNull = ctx.freshName("hasNull")
        val off = ctx.freshName("off")
        val t = ctx.freshName("t")
        val p = ctx.freshName("p")
        val i = ctx.freshName("i")
        val d = ctx.freshName("d")
        val acc = ctx.freshName("acc")
        val sig = ctx.freshName("sig")
        val margins = ctx.freshName("margins")
        val used = ctx.freshName("used")
        val j = ctx.freshName("j")
        val q = ctx.freshName("q")
        val best = ctx.freshName("best")
        val bestM = ctx.freshName("bestM")
        val stride = 1 + nprobe
        s"""
           |int $dim = $a.numElements();
           |if ($b.numElements() != ${tables * bits} * $dim) {
           |  ${ev.isNull} = true;
           |} else {
           |  int[] $out = new int[${tables * stride}];
           |  boolean $hasNull = false;
           |  for (int $d = 0; $d < $dim && !$hasNull; $d++) $hasNull = $a.isNullAt($d);
           |  if (!$hasNull) {
           |    double[] $margins = new double[$bits];
           |    boolean[] $used = new boolean[$bits];
           |    int $off = 0;
           |    for (int $t = 0; $t < $tables; $t++) {
           |      int $sig = 0;
           |      for (int $p = 0; $p < $bits; $p++) {
           |        double $acc = 0.0;
           |        for (int $i = 0; $i < $dim; $i++) {
           |          $acc += (double) $a.getFloat($i) * (double) $b.getFloat($off + $i);
           |        }
           |        $off += $dim;
           |        if ($acc >= 0.0) $sig |= (1 << $p);
           |        $margins[$p] = ($acc < 0.0) ? -$acc : $acc;
           |      }
           |      $out[$t * $stride] = $sig;
           |      java.util.Arrays.fill($used, false);
           |      for (int $j = 0; $j < $nprobe; $j++) {
           |        int $best = -1;
           |        double $bestM = Double.MAX_VALUE;
           |        for (int $q = 0; $q < $bits; $q++) {
           |          if (!$used[$q] && $margins[$q] < $bestM) { $best = $q; $bestM = $margins[$q]; }
           |        }
           |        $used[$best] = true;
           |        $out[$t * $stride + 1 + $j] = $sig ^ (1 << $best);
           |      }
           |    }
           |  }
           |  ${ev.value} =
           |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Product-quantization encode in ONE expression:
    * `vec_pq_encode(vec, centroids, m, k)` → ARRAY<TINYINT> of m codes.
    * `centroids` is a flat literal of m×k×dsub floats (subspace j, cell c
    * occupies [(j·k + c)·dsub, +dsub), dsub = dim/m); code j = argmin over
    * c of the L2 distance between vec's j-th subvector and cell c, lowest
    * c on ties (deterministic). Same rationale as vec_lsh: the m×k
    * per-column formulation would janino-compile a huge projection; this
    * node is one constant-size triple loop.
    *
    * NULL semantics: NULL vec → NULL; dim not divisible by m, centroids
    * length mismatch, or a null element → NULL.
    */
  case class FloatPqEncode(left: Expression, right: Expression, m: Int, k: Int)
      extends BinaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      if (children.forall(_.dataType.isInstanceOf[ArrayType]) &&
          children.forall(_.dataType.asInstanceOf[ArrayType].elementType == FloatType)) {
        // codes are UNSIGNED bytes since round 14 (decoders mask with
        // 0xFF), so a full 8-bit codebook — k = 256, the Faiss default
        // precision — fits the same m-byte storage
        if (m >= 1 && k >= 1 && k <= 256) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires m >= 1 and 1 <= k <= 256, got m=$m k=$k")
      } else
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires ARRAY<FLOAT> vec and centroids arguments, got " +
            children.map(_.dataType.catalogString).mkString(", "))
    override def dataType: DataType =
      ArrayType(org.apache.spark.sql.types.ByteType, containsNull = false)
    override def prettyName: String = "vec_pq_encode"
    override def nullable: Boolean = true

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val cents = b.asInstanceOf[ArrayData]
      val dim = x.numElements()
      if (m <= 0 || dim % m != 0) return null
      val dsub = dim / m
      if (cents.numElements() != m * k * dsub) return null
      var i = 0
      while (i < dim) { if (x.isNullAt(i)) return null; i += 1 }
      val out = new Array[Byte](m)
      var j = 0
      while (j < m) {
        var best = 0
        var bestDist = Double.MaxValue
        var c = 0
        while (c < k) {
          val off = (j * k + c) * dsub
          var dist = 0.0
          var d = 0
          while (d < dsub) {
            val diff = x.getFloat(j * dsub + d).toDouble - cents.getFloat(off + d).toDouble
            dist += diff * diff
            d += 1
          }
          if (dist < bestDist) { bestDist = dist; best = c }
          c += 1
        }
        out(j) = best.toByte
        j += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val dim = ctx.freshName("dim")
        val dsub = ctx.freshName("dsub")
        val out = ctx.freshName("out")
        val bad = ctx.freshName("bad")
        val j = ctx.freshName("j")
        val c = ctx.freshName("c")
        val d = ctx.freshName("d")
        val i = ctx.freshName("i")
        val off = ctx.freshName("off")
        val dist = ctx.freshName("dist")
        val diff = ctx.freshName("diff")
        val best = ctx.freshName("best")
        val bestDist = ctx.freshName("bestDist")
        s"""
           |int $dim = $a.numElements();
           |boolean $bad = ($dim % $m != 0);
           |int $dsub = $bad ? 0 : $dim / $m;
           |if (!$bad && $b.numElements() != ${m * k} * $dsub) $bad = true;
           |if (!$bad) for (int $i = 0; $i < $dim && !$bad; $i++) $bad = $a.isNullAt($i);
           |if ($bad) {
           |  ${ev.isNull} = true;
           |  ${ev.value} = null;
           |} else {
           |  byte[] $out = new byte[$m];
           |  for (int $j = 0; $j < $m; $j++) {
           |    int $best = 0;
           |    double $bestDist = Double.MAX_VALUE;
           |    for (int $c = 0; $c < $k; $c++) {
           |      int $off = ($j * $k + $c) * $dsub;
           |      double $dist = 0.0;
           |      for (int $d = 0; $d < $dsub; $d++) {
           |        double $diff = (double) $a.getFloat($j * $dsub + $d)
           |          - (double) $b.getFloat($off + $d);
           |        $dist += $diff * $diff;
           |      }
           |      if ($dist < $bestDist) { $bestDist = $dist; $best = $c; }
           |    }
           |    $out[$j] = (byte) $best;
           |  }
           |  ${ev.value} =
           |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Asymmetric-distance (ADC) scoring: `vec_pq_adc(codes, table, k)` →
    * DOUBLE = Σ_j table[j·k + codes[j]] where `table` is the per-query
    * m×k flat literal of partial dot products (query subvector · centroid).
    * The query-time hot path of PQ search: m array lookups per candidate —
    * no float vector is read at all.
    *
    * NULL semantics: NULL codes → NULL; table length not a multiple of k
    * aligned with codes length, or a code outside [0, k) → NULL.
    */
  case class PqAdcScore(left: Expression, right: Expression, k: Int)
      extends BinaryExpression {

    override def checkInputDataTypes(): TypeCheckResult = {
      val codesOk = left.dataType match {
        case ArrayType(org.apache.spark.sql.types.ByteType, _) => true
        case _ => false
      }
      val tableOk = right.dataType match {
        case ArrayType(FloatType, _) => true
        case _ => false
      }
      if (codesOk && tableOk && k >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<TINYINT> codes, ARRAY<FLOAT> table, k >= 1; got " +
          children.map(_.dataType.catalogString).mkString(", ") + s", k=$k")
    }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_pq_adc"
    override def nullable: Boolean = true

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val codes = a.asInstanceOf[ArrayData]
      val table = b.asInstanceOf[ArrayData]
      val m = codes.numElements()
      if (table.numElements() != m * k) return null
      var acc = 0.0
      var j = 0
      while (j < m) {
        if (codes.isNullAt(j)) return null
        // UNSIGNED byte decode (round 14): codes 128..255 store as
        // negative signed bytes — masking makes k up to 256 (8-bit
        // subquantizers, the Faiss default) readable; 0..127 unchanged
        val c = codes.getByte(j).toInt & 0xFF
        if (c >= k) return null
        acc += table.getFloat(j * k + c).toDouble
        j += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val m = ctx.freshName("m")
        val j = ctx.freshName("j")
        val c = ctx.freshName("c")
        val acc = ctx.freshName("acc")
        s"""
           |int $m = $a.numElements();
           |double $acc = 0.0;
           |if ($b.numElements() != $m * $k) {
           |  ${ev.isNull} = true;
           |} else {
           |  for (int $j = 0; $j < $m; $j++) {
           |    if ($a.isNullAt($j)) { ${ev.isNull} = true; break; }
           |    int $c = ((int) $a.getByte($j)) & 0xFF;
           |    if ($c >= $k) { ${ev.isNull} = true; break; }
           |    $acc += (double) $b.getFloat($j * $k + $c);
           |  }
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Symmetric-distance (SDC) scoring between two CODE vectors:
    * `vec_pq_sdc(codes_a, codes_b, table, k)` → DOUBLE =
    * Σ_j table[(j·k + a_j)·k + b_j], where `table` is the m×k×k flat
    * literal of pairwise subquantizer codeword dot products
    * (codebook_j[c1] · codebook_j[c2]) — the code-to-code half of a
    * reconstructed dot product, no float vector read on either side
    * (round 16: the candidate scorer for near-dup pairs over an ivfpq
    * index, where the slices store codes only). Symmetric by
    * construction when the table is.
    *
    * NULL semantics mirror vec_pq_adc: NULL codes → NULL; length
    * mismatch between the two code arrays, table size not m·k·k, or a
    * code outside [0, k) → NULL. Codes decode UNSIGNED (mask 0xFF) —
    * 8-bit subquantizers supported.
    */
  case class PqSdcScore(first: Expression, second: Expression,
                        third: Expression, k: Int)
      extends TernaryExpression {

    override def checkInputDataTypes(): TypeCheckResult = {
      def codesOk(e: Expression) = e.dataType match {
        case ArrayType(org.apache.spark.sql.types.ByteType, _) => true
        case _ => false
      }
      val tableOk = third.dataType match {
        case ArrayType(FloatType, _) => true
        case _ => false
      }
      if (codesOk(first) && codesOk(second) && tableOk && k >= 1)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<TINYINT> codes ×2, ARRAY<FLOAT> " +
        s"table, k >= 1; got " +
        children.map(_.dataType.catalogString).mkString(", ") + s", k=$k")
    }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_pq_sdc"
    override def nullable: Boolean = true

    override protected def nullSafeEval(a: Any, b: Any, t: Any): Any = {
      val ca = a.asInstanceOf[ArrayData]
      val cb = b.asInstanceOf[ArrayData]
      val table = t.asInstanceOf[ArrayData]
      val m = ca.numElements()
      if (cb.numElements() != m || table.numElements() != m * k * k)
        return null
      var acc = 0.0
      var j = 0
      while (j < m) {
        if (ca.isNullAt(j) || cb.isNullAt(j)) return null
        val x = ca.getByte(j).toInt & 0xFF
        val y = cb.getByte(j).toInt & 0xFF
        if (x >= k || y >= k) return null
        acc += table.getFloat((j * k + x) * k + y).toDouble
        j += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b, t) => {
        val m = ctx.freshName("m")
        val j = ctx.freshName("j")
        val x = ctx.freshName("x")
        val y = ctx.freshName("y")
        val acc = ctx.freshName("acc")
        s"""
           |int $m = $a.numElements();
           |double $acc = 0.0;
           |if ($b.numElements() != $m || $t.numElements() != $m * $k * $k) {
           |  ${ev.isNull} = true;
           |} else {
           |  for (int $j = 0; $j < $m; $j++) {
           |    if ($a.isNullAt($j) || $b.isNullAt($j)) { ${ev.isNull} = true; break; }
           |    int $x = ((int) $a.getByte($j)) & 0xFF;
           |    int $y = ((int) $b.getByte($j)) & 0xFF;
           |    if ($x >= $k || $y >= $k) { ${ev.isNull} = true; break; }
           |    $acc += (double) $t.getFloat(($j * $k + $x) * $k + $y);
           |  }
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newFirst: Expression, newSecond: Expression,
        newThird: Expression): Expression =
      copy(first = newFirst, second = newSecond, third = newThird)
  }

  /** Per-CELL ADC scoring from ONE shared flat table:
    * `vec_pq_adc_at(codes, tables, cell, k)` → DOUBLE =
    * Σ_j tables[(cell·m + j)·k + codes_j], where `tables` is the
    * nlist×m×k flat literal of every cell's ADC table (round 17). The
    * row's `cell` column SELECTS its slice — so a candidate-pair scan
    * scoring millions of rows references one shared constant instead
    * of materializing a 4·m·k-byte joined array per row (measured: the
    * per-row joined tables were ~5× the whole float-path cost at 3M
    * pairs × m=16/k=256 — the wide-join trap, from the scoring side).
    *
    * NULL semantics mirror vec_pq_adc: NULL codes/cell → NULL; tables
    * length not a multiple of m·k, cell outside [0, nlist), or a code
    * outside [0, k) → NULL.
    */
  case class PqAdcAtScore(first: Expression, second: Expression,
                          third: Expression, k: Int)
      extends TernaryExpression {

    override def checkInputDataTypes(): TypeCheckResult = {
      val codesOk = first.dataType match {
        case ArrayType(org.apache.spark.sql.types.ByteType, _) => true
        case _ => false
      }
      val tableOk = second.dataType match {
        case ArrayType(FloatType, _) => true
        case _ => false
      }
      val cellOk = third.dataType == org.apache.spark.sql.types.IntegerType
      if (codesOk && tableOk && cellOk && k >= 1)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<TINYINT> codes, ARRAY<FLOAT> " +
        s"tables, INT cell, k >= 1; got " +
        children.map(_.dataType.catalogString).mkString(", ") + s", k=$k")
    }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_pq_adc_at"
    override def nullable: Boolean = true

    override protected def nullSafeEval(a: Any, t: Any, cl: Any): Any = {
      val codes = a.asInstanceOf[ArrayData]
      val tables = t.asInstanceOf[ArrayData]
      val cell = cl.asInstanceOf[Int]
      val m = codes.numElements()
      if (m == 0) return 0.0
      val slice = m * k
      if (tables.numElements() % slice != 0) return null
      if (cell < 0 || cell >= tables.numElements() / slice) return null
      var acc = 0.0
      var j = 0
      while (j < m) {
        if (codes.isNullAt(j)) return null
        val c = codes.getByte(j).toInt & 0xFF
        if (c >= k) return null
        acc += tables.getFloat(cell * slice + j * k + c).toDouble
        j += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, t, cl) => {
        val m = ctx.freshName("m")
        val slice = ctx.freshName("slice")
        val j = ctx.freshName("j")
        val c = ctx.freshName("c")
        val acc = ctx.freshName("acc")
        s"""
           |int $m = $a.numElements();
           |int $slice = $m * $k;
           |double $acc = 0.0;
           |if ($m > 0 && ($t.numElements() % $slice != 0 ||
           |    $cl < 0 || $cl >= $t.numElements() / $slice)) {
           |  ${ev.isNull} = true;
           |} else {
           |  for (int $j = 0; $j < $m; $j++) {
           |    if ($a.isNullAt($j)) { ${ev.isNull} = true; break; }
           |    int $c = ((int) $a.getByte($j)) & 0xFF;
           |    if ($c >= $k) { ${ev.isNull} = true; break; }
           |    $acc += (double) $t.getFloat($cl * $slice + $j * $k + $c);
           |  }
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newFirst: Expression, newSecond: Expression,
        newThird: Expression): Expression =
      copy(first = newFirst, second = newSecond, third = newThird)
  }

  /** Dot product of two ROWS of a flat literal matrix:
    * `vec_rows_dot(table, i, j, dim)` → DOUBLE =
    * Σ_d table[i·dim + d] · table[j·dim + d] (round 17) — the
    * centroid·centroid term of a cross-cell reconstructed dot product,
    * computed against one shared nlist×dim constant instead of two
    * dim-float arrays broadcast-joined onto every candidate row.
    *
    * NULL semantics: NULL indices → NULL; table length not a multiple
    * of dim, or an index outside [0, rows) → NULL.
    */
  case class RowsDot(first: Expression, second: Expression,
                     third: Expression, dim: Int)
      extends TernaryExpression {

    override def checkInputDataTypes(): TypeCheckResult = {
      val tableOk = first.dataType match {
        case ArrayType(FloatType, _) => true
        case _ => false
      }
      val intOk = Seq(second, third)
        .forall(_.dataType == org.apache.spark.sql.types.IntegerType)
      if (tableOk && intOk && dim >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<FLOAT> table, INT i, INT j, " +
        s"dim >= 1; got " +
        children.map(_.dataType.catalogString).mkString(", ") + s", dim=$dim")
    }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_rows_dot"
    override def nullable: Boolean = true

    override protected def nullSafeEval(t: Any, ia: Any, ja: Any): Any = {
      val table = t.asInstanceOf[ArrayData]
      val i = ia.asInstanceOf[Int]
      val j = ja.asInstanceOf[Int]
      val n = table.numElements()
      if (n % dim != 0) return null
      val rows = n / dim
      if (i < 0 || i >= rows || j < 0 || j >= rows) return null
      var acc = 0.0
      var d = 0
      while (d < dim) {
        acc += table.getFloat(i * dim + d).toDouble *
          table.getFloat(j * dim + d).toDouble
        d += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (t, i, j) => {
        val rows = ctx.freshName("rows")
        val d = ctx.freshName("d")
        val acc = ctx.freshName("acc")
        s"""
           |double $acc = 0.0;
           |if ($t.numElements() % $dim != 0) {
           |  ${ev.isNull} = true;
           |} else {
           |  int $rows = $t.numElements() / $dim;
           |  if ($i < 0 || $i >= $rows || $j < 0 || $j >= $rows) {
           |    ${ev.isNull} = true;
           |  } else {
           |    for (int $d = 0; $d < $dim; $d++) {
           |      $acc += (double) $t.getFloat($i * $dim + $d) *
           |        (double) $t.getFloat($j * $dim + $d);
           |    }
           |  }
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newFirst: Expression, newSecond: Expression,
        newThird: Expression): Expression =
      copy(first = newFirst, second = newSecond, third = newThird)
  }

  /** BROADCAST-table variants of the PQ scoring kernels (round 17):
    * identical math to the literal forms, but the shared table ships
    * as a Spark Broadcast handle — the expression tree carries a few
    * bytes instead of megabytes, so Catalyst's hashing/stringification
    * and per-task closure serialization stay O(1) in the table size
    * (a 4 MB SDC literal was measured adding ~14 s of pure plan
    * overhead to a 4 s candidate scan at kPq=256), executors fetch one
    * torrent copy, and the scoring loops index a PRIMITIVE float[]
    * rather than ArrayData. Scala-construction only (a Broadcast
    * cannot ride SQL text) via ClassicShim.column — the SQL TVF
    * reaches them through the same Scala scorer.
    */
  case class BcastPqSdc(left: Expression, right: Expression,
                        table: org.apache.spark.broadcast.Broadcast[Array[Float]],
                        k: Int)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = {
      def codesOk(e: Expression) = e.dataType match {
        case ArrayType(org.apache.spark.sql.types.ByteType, _) => true
        case _ => false
      }
      if (codesOk(left) && codesOk(right) && k >= 1)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<TINYINT> codes ×2, k >= 1; got " +
          children.map(_.dataType.catalogString).mkString(", ") + s", k=$k")
    }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_pq_sdc_bcast"
    override def nullable: Boolean = true

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val ca = a.asInstanceOf[ArrayData]
      val cb = b.asInstanceOf[ArrayData]
      val t = table.value
      val m = ca.numElements()
      if (cb.numElements() != m || t.length != m * k * k) return null
      var acc = 0.0
      var j = 0
      while (j < m) {
        if (ca.isNullAt(j) || cb.isNullAt(j)) return null
        val x = ca.getByte(j).toInt & 0xFF
        val y = cb.getByte(j).toInt & 0xFF
        if (x >= k || y >= k) return null
        acc += t((j * k + x) * k + y).toDouble
        j += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bc = ctx.addReferenceObj("sdcBcast", table,
        classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val t = ctx.freshName("tbl")
        val m = ctx.freshName("m")
        val j = ctx.freshName("j")
        val x = ctx.freshName("x")
        val y = ctx.freshName("y")
        val acc = ctx.freshName("acc")
        s"""
           |float[] $t = (float[]) $bc.value();
           |int $m = $a.numElements();
           |double $acc = 0.0;
           |if ($b.numElements() != $m || $t.length != $m * $k * $k) {
           |  ${ev.isNull} = true;
           |} else {
           |  for (int $j = 0; $j < $m; $j++) {
           |    if ($a.isNullAt($j) || $b.isNullAt($j)) { ${ev.isNull} = true; break; }
           |    int $x = ((int) $a.getByte($j)) & 0xFF;
           |    int $y = ((int) $b.getByte($j)) & 0xFF;
           |    if ($x >= $k || $y >= $k) { ${ev.isNull} = true; break; }
           |    $acc += (double) $t[($j * $k + $x) * $k + $y];
           |  }
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Broadcast twin of [[PqAdcAtScore]] — see [[BcastPqSdc]]. */
  case class BcastPqAdcAt(left: Expression, right: Expression,
                          tables: org.apache.spark.broadcast.Broadcast[Array[Float]],
                          k: Int)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = {
      val codesOk = left.dataType match {
        case ArrayType(org.apache.spark.sql.types.ByteType, _) => true
        case _ => false
      }
      val cellOk = right.dataType == org.apache.spark.sql.types.IntegerType
      if (codesOk && cellOk && k >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<TINYINT> codes, INT cell, k >= 1; " +
          "got " +
          children.map(_.dataType.catalogString).mkString(", ") + s", k=$k")
    }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_pq_adc_at_bcast"
    override def nullable: Boolean = true

    override protected def nullSafeEval(a: Any, cl: Any): Any = {
      val codes = a.asInstanceOf[ArrayData]
      val t = tables.value
      val cell = cl.asInstanceOf[Int]
      val m = codes.numElements()
      if (m == 0) return 0.0
      val slice = m * k
      if (t.length % slice != 0) return null
      if (cell < 0 || cell >= t.length / slice) return null
      var acc = 0.0
      var j = 0
      while (j < m) {
        if (codes.isNullAt(j)) return null
        val c = codes.getByte(j).toInt & 0xFF
        if (c >= k) return null
        acc += t(cell * slice + j * k + c).toDouble
        j += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bc = ctx.addReferenceObj("adcBcast", tables,
        classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
      nullSafeCodeGen(ctx, ev, (a, cl) => {
        val t = ctx.freshName("tbl")
        val m = ctx.freshName("m")
        val slice = ctx.freshName("slice")
        val j = ctx.freshName("j")
        val c = ctx.freshName("c")
        val acc = ctx.freshName("acc")
        s"""
           |float[] $t = (float[]) $bc.value();
           |int $m = $a.numElements();
           |int $slice = $m * $k;
           |double $acc = 0.0;
           |if ($m > 0 && ($t.length % $slice != 0 ||
           |    $cl < 0 || $cl >= $t.length / $slice)) {
           |  ${ev.isNull} = true;
           |} else {
           |  for (int $j = 0; $j < $m; $j++) {
           |    if ($a.isNullAt($j)) { ${ev.isNull} = true; break; }
           |    int $c = ((int) $a.getByte($j)) & 0xFF;
           |    if ($c >= $k) { ${ev.isNull} = true; break; }
           |    $acc += (double) $t[$cl * $slice + $j * $k + $c];
           |  }
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Broadcast twin of [[RowsDot]] — see [[BcastPqSdc]]. */
  case class BcastRowsDot(left: Expression, right: Expression,
                          table: org.apache.spark.broadcast.Broadcast[Array[Float]],
                          dim: Int)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = {
      val intOk = children
        .forall(_.dataType == org.apache.spark.sql.types.IntegerType)
      if (intOk && dim >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires INT i, INT j, dim >= 1; got " +
          children.map(_.dataType.catalogString).mkString(", ") +
          s", dim=$dim")
    }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_rows_dot_bcast"
    override def nullable: Boolean = true

    override protected def nullSafeEval(ia: Any, ja: Any): Any = {
      val t = table.value
      val i = ia.asInstanceOf[Int]
      val j = ja.asInstanceOf[Int]
      if (t.length % dim != 0) return null
      val rows = t.length / dim
      if (i < 0 || i >= rows || j < 0 || j >= rows) return null
      var acc = 0.0
      var d = 0
      while (d < dim) {
        acc += t(i * dim + d).toDouble * t(j * dim + d).toDouble
        d += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bc = ctx.addReferenceObj("rowsDotBcast", table,
        classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
      nullSafeCodeGen(ctx, ev, (i, j) => {
        val t = ctx.freshName("tbl")
        val rows = ctx.freshName("rows")
        val d = ctx.freshName("d")
        val acc = ctx.freshName("acc")
        s"""
           |float[] $t = (float[]) $bc.value();
           |double $acc = 0.0;
           |if ($t.length % $dim != 0) {
           |  ${ev.isNull} = true;
           |} else {
           |  int $rows = $t.length / $dim;
           |  if ($i < 0 || $i >= $rows || $j < 0 || $j >= $rows) {
           |    ${ev.isNull} = true;
           |  } else {
           |    for (int $d = 0; $d < $dim; $d++) {
           |      $acc += (double) $t[$i * $dim + $d] *
           |        (double) $t[$j * $dim + $d];
           |    }
           |  }
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** TOP-2 coarse cells by dot product against a BROADCAST flat
    * centroid matrix (round 17): returns ARRAY<INT> — [best] when the
    * quantizer has one cell, else [best, second]. Ties reproduce
    * array_max over struct(score, cell) exactly (equal score → HIGHER
    * cell wins), the contract every assignment path shares. Replaces
    * the nlist-literal struct array + array_sort expression, whose
    * tree grows with nlist and whose per-row O(nlist log nlist) boxed
    * struct sort was measured 6× slower than this primitive two-maxima
    * scan at nlist=1024 (and whose janino compile grows with the
    * tree). See [[BcastPqSdc]] for why the table ships as a Broadcast.
    */
  case class BcastTop2Cells(child: Expression,
                            cents: org.apache.spark.broadcast.Broadcast[Array[Float]],
                            dim: Int)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = {
      val vecOk = child.dataType match {
        case ArrayType(FloatType, _) => true
        case _ => false
      }
      if (vecOk && dim >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<FLOAT> vec, dim >= 1; got " +
          child.dataType.catalogString + s", dim=$dim")
    }
    override def dataType: DataType =
      ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
    override def prettyName: String = "vec_top2_cells"
    override def nullable: Boolean = true

    override protected def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val t = cents.value
      if (x.numElements() != dim || t.length % dim != 0) return null
      val nlist = t.length / dim
      if (nlist == 0) return null
      var c1 = -1; var s1 = Double.NegativeInfinity
      var c2 = -1; var s2 = Double.NegativeInfinity
      var c = 0
      while (c < nlist) {
        var s = 0.0
        var d = 0
        while (d < dim) {
          if (x.isNullAt(d)) return null
          s += x.getFloat(d).toDouble * t(c * dim + d).toDouble
          d += 1
        }
        if (s >= s1) { s2 = s1; c2 = c1; s1 = s; c1 = c }
        else if (s >= s2) { s2 = s; c2 = c }
        c += 1
      }
      val out = if (nlist == 1) Array(c1) else Array(c1, c2)
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bc = ctx.addReferenceObj("centsBcast", cents,
        classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
      nullSafeCodeGen(ctx, ev, a => {
        val t = ctx.freshName("tbl")
        val nlist = ctx.freshName("nlist")
        val c1 = ctx.freshName("c1"); val s1 = ctx.freshName("s1")
        val c2 = ctx.freshName("c2"); val s2 = ctx.freshName("s2")
        val c = ctx.freshName("c"); val d = ctx.freshName("d")
        val s = ctx.freshName("s")
        val out = ctx.freshName("out")
        s"""
           |float[] $t = (float[]) $bc.value();
           |if ($a.numElements() != $dim || $t.length % $dim != 0 ||
           |    $t.length == 0) {
           |  ${ev.isNull} = true;
           |} else {
           |  int $nlist = $t.length / $dim;
           |  int $c1 = -1; double $s1 = Double.NEGATIVE_INFINITY;
           |  int $c2 = -1; double $s2 = Double.NEGATIVE_INFINITY;
           |  for (int $c = 0; $c < $nlist && !${ev.isNull}; $c++) {
           |    double $s = 0.0;
           |    for (int $d = 0; $d < $dim; $d++) {
           |      if ($a.isNullAt($d)) { ${ev.isNull} = true; break; }
           |      $s += (double) $a.getFloat($d) *
           |        (double) $t[$c * $dim + $d];
           |    }
           |    if (!${ev.isNull}) {
           |      if ($s >= $s1) { $s2 = $s1; $c2 = $c1; $s1 = $s; $c1 = $c; }
           |      else if ($s >= $s2) { $s2 = $s; $c2 = $c; }
           |    }
           |  }
           |  if (!${ev.isNull}) {
           |    int[] $out = ($nlist == 1) ? new int[]{$c1}
           |      : new int[]{$c1, $c2};
           |    ${ev.value} = org.apache.spark.sql.catalyst.expressions
           |      .UnsafeArrayData.fromPrimitiveArray($out);
           |  }
           |}
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Extracts a foldable INT argument at build time (vec_lsh's and the PQ
    * expressions' shape arguments are structural constants — they size the
    * generated loops).
    */
  private def foldableInt(e: Expression, name: String): Int = {
    require(e.foldable, s"$name argument must be a literal, got $e")
    e.eval(null) match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$name argument must be an integer literal, got $other")
    }
  }

  /** The registration triples, shared by [[register]] and GraftExtensions
    * so the two paths cannot drift. Builders validate arity up front — the
    * registry hands them whatever argument list the user wrote.
    */
  val builtins: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVectorDot].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"vec_dot requires exactly 2 arguments, got ${children.size}")
        FloatVectorDot(children(0), children(1))
      }),
    (FunctionIdentifier("vec_norm_sq"),
      new ExpressionInfo(classOf[FloatVectorNormSq].getName, "vec_norm_sq"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"vec_norm_sq requires exactly 1 argument, got ${children.size}")
        FloatVectorNormSq(children.head)
      }),
    (FunctionIdentifier("vec_lsh"),
      new ExpressionInfo(classOf[FloatLshSignature].getName, "vec_lsh"),
      (children: Seq[Expression]) => {
        require(children.size == 4,
          s"vec_lsh requires exactly 4 arguments (vec, planes, bits, tables), got ${children.size}")
        FloatLshSignature(children(0), children(1),
          foldableInt(children(2), "vec_lsh bits"), foldableInt(children(3), "vec_lsh tables"))
      }),
    (FunctionIdentifier("vec_lsh_probe"),
      new ExpressionInfo(classOf[FloatLshMultiProbe].getName, "vec_lsh_probe"),
      (children: Seq[Expression]) => {
        require(children.size == 5,
          s"vec_lsh_probe requires exactly 5 arguments (vec, planes, bits, tables, nprobe), got ${children.size}")
        FloatLshMultiProbe(children(0), children(1),
          foldableInt(children(2), "vec_lsh_probe bits"),
          foldableInt(children(3), "vec_lsh_probe tables"),
          foldableInt(children(4), "vec_lsh_probe nprobe"))
      }),
    (FunctionIdentifier("vec_pq_encode"),
      new ExpressionInfo(classOf[FloatPqEncode].getName, "vec_pq_encode"),
      (children: Seq[Expression]) => {
        require(children.size == 4,
          s"vec_pq_encode requires exactly 4 arguments (vec, centroids, m, k), got ${children.size}")
        FloatPqEncode(children(0), children(1),
          foldableInt(children(2), "vec_pq_encode m"), foldableInt(children(3), "vec_pq_encode k"))
      }),
    (FunctionIdentifier("vec_pq_adc"),
      new ExpressionInfo(classOf[PqAdcScore].getName, "vec_pq_adc"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          s"vec_pq_adc requires exactly 3 arguments (codes, table, k), got ${children.size}")
        PqAdcScore(children(0), children(1), foldableInt(children(2), "vec_pq_adc k"))
      }),
    (FunctionIdentifier("vec_pq_sdc"),
      new ExpressionInfo(classOf[PqSdcScore].getName, "vec_pq_sdc"),
      (children: Seq[Expression]) => {
        require(children.size == 4,
          s"vec_pq_sdc requires exactly 4 arguments (codes_a, codes_b, table, k), got ${children.size}")
        PqSdcScore(children(0), children(1), children(2),
          foldableInt(children(3), "vec_pq_sdc k"))
      }),
    (FunctionIdentifier("vec_pq_adc_at"),
      new ExpressionInfo(classOf[PqAdcAtScore].getName, "vec_pq_adc_at"),
      (children: Seq[Expression]) => {
        require(children.size == 4,
          s"vec_pq_adc_at requires exactly 4 arguments (codes, tables, cell, k), got ${children.size}")
        PqAdcAtScore(children(0), children(1), children(2),
          foldableInt(children(3), "vec_pq_adc_at k"))
      }),
    (FunctionIdentifier("vec_rows_dot"),
      new ExpressionInfo(classOf[RowsDot].getName, "vec_rows_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 4,
          s"vec_rows_dot requires exactly 4 arguments (table, i, j, dim), got ${children.size}")
        RowsDot(children(0), children(1), children(2),
          foldableInt(children(3), "vec_rows_dot dim"))
      }))

  /** Idempotent per-session registration so `expr("vec_dot(a, b)")` and SQL
    * both resolve. Called from the query builders (the driver harness
    * constructs the SparkSession itself, so there is no extensions hook).
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builtins.foreach { case (id, info, builder) =>
      reg.registerFunction(id, info, builder)
    }
  }
}
