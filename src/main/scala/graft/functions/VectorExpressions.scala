package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native Catalyst expression for the float-vector dot product — the hot
  * inner loop of similarity search. A `zip_with`+`aggregate` HOF pipeline
  * computes the same value but runs interpreted with per-element boxing;
  * this expression compiles (doGenCode) to a primitive Java loop over the
  * two ArrayData buffers inside whole-stage codegen, evaluating
  * left-to-right in array order exactly like the HOF form (bit-identical
  * doubles, including null-element propagation to a NULL result).
  *
  * This is the one place the engine drops below the DataFrame API for
  * performance, per the custom-operator preference order: compose builtins
  * (too slow here) → custom Expression (this) → custom SparkPlan (overkill).
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  /** Registered as a user-callable SQL function, so inputs must be
    * validated at analysis time — arbitrary arrays would otherwise be read
    * as garbage through the typed ArrayData accessors.
    */
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _                                                  => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double> arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  private def elemsNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, n) => n
    case _               => true
  }

  /** Null when either input is null, the lengths differ, OR any paired
    * element is null (the zip_with product-with-null semantics). The
    * length-mismatch NULL matters because `vec_dot` is a user-callable SQL
    * function: a silently-truncated partial dot product would mask
    * dimension-mismatch bugs in the caller's data.
    */
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (lf, rf) = (isFloat(left), isFloat(right))
    val n = x.numElements()
    if (y.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val getX = if (isFloat(left)) s"(double) $x.getFloat($i)" else s"$x.getDouble($i)"
      val getY = if (isFloat(right)) s"(double) $y.getFloat($i)" else s"$y.getDouble($i)"
      // element-null guard only when the schema says elements can be null
      val nullGuard =
        if (elemsNullable(left) || elemsNullable(right))
          s"""if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }"""
        else ""
      s"""
         |int $n = $x.numElements();
         |double $s = 0.0;
         |if ($y.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullGuard
         |    $s += $getX * $getY;
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All `tables` LSH sign-pattern bucket ids of a vector in ONE expression:
  * `bucket[t] = Σ_p (v · hyperplane(t,p) > 0) << p` over the deterministic
  * md5-derived ±1 hyperplanes (same family as
  * [[graft.operators.Similarity.hyperplanes]] — signs depend only on
  * (table, plane, dim-index), so they are derived lazily per input
  * dimension and mirrored verbatim in the DuckDB oracle SQL).
  *
  * Why one expression instead of `tables × planes` `vec_dot` calls: the
  * inlined form generates ~130 bytes of Java per plane — at 96 tables × 5
  * planes the projection method passes janino's 64 KB limit and the whole
  * stage silently falls back to interpreted evaluation. Here codegen emits
  * a single call into [[compute]] (a reference object), so the generated
  * method stays tiny, whole-stage codegen survives, and the hot loop is
  * one JIT-compiled pass with good cache locality over a sign matrix
  * instead of 480 janino fragments.
  *
  * Arithmetic parity: accumulation is left-to-right in array order,
  * multiplying each element by ±1.0 — an exact IEEE sign flip — so bucket
  * bits agree bit-for-bit with the oracle's `(+v[1] -v[2] …)` sums and
  * with the `vec_dot(v, ±1-array)` form this replaces.
  */
case class HyperplaneBuckets(child: Expression, tables: Int, planes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> or array<double> argument, got ${dt.simpleString}")
  }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  /** Sign rows for (table·planes + plane), derived for one dimension count;
    * cached per dim (dims are uniform in practice — the cache has one
    * entry). Rebuilt per executor after deserialization.
    */
  @transient private lazy val signCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Double]]]()

  private def signs(dim: Int): Array[Array[Double]] =
    signCache.computeIfAbsent(dim, d => {
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(tables * planes) { tp =>
        val (t, p) = (tp / planes, tp % planes)
        Array.tabulate(d) { i =>
          val h = md.digest(s"$t:$p:$i".getBytes("UTF-8"))
          if ((h(0) & 1) == 1) 1.0 else -1.0
        }
      }
    })

  /** The per-row kernel — called from both eval paths. Public-to-codegen
    * via a reference object.
    */
  def compute(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val sg = signs(n)
    val fl = isFloat
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < planes) {
        val row = sg(t * planes + p)
        var s = 0.0
        var nullSeen = false
        var d = 0
        while (d < n && !nullSeen) {
          if (v.isNullAt(d)) nullSeen = true
          else s += (if (fl) v.getFloat(d).toDouble else v.getDouble(d)) * row(d)
          d += 1
        }
        // a null element nulls the dot product; a null comparison is false
        // — same bit-0 outcome as the when(vec_dot > 0) form it replaces
        if (!nullSeen && s > 0) bucket |= 1L << p
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hpBuckets", this, classOf[HyperplaneBuckets].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $ref.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Johnson–Lindenstrauss random projection: the `planes` signed sums
  * `out[k] = v · r_k` over the md5-derived ±1 vectors `r_k` (same
  * deterministic family as [[HyperplaneBuckets]], seeded by `table` — in
  * fact [[HyperplaneBuckets]] IS the sign bit of this projection). Keeping
  * the real-valued sums instead of the sign turns the LSH bucketer into a
  * dimensionality reducer: distances/dots in the reduced space estimate
  * the originals within the JL bound, at planes/dim the bytes per row.
  *
  * One kernel expression for the same reason as [[HyperplaneBuckets]]
  * (janino method-size + codegen survival), and the same left-to-right
  * ±1.0 accumulation, so each component replays exactly as the oracle's
  * `(+v[1] -v[2] …)` signed sums.
  */
case class RandomProjection(child: Expression, table: Int, planes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "random_projection"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> or array<double> argument, got ${dt.simpleString}")
  }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  @transient private lazy val signCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Double]]]()

  private def signs(dim: Int): Array[Array[Double]] =
    signCache.computeIfAbsent(dim, d => {
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(planes) { p =>
        Array.tabulate(d) { i =>
          val h = md.digest(s"$table:$p:$i".getBytes("UTF-8"))
          if ((h(0) & 1) == 1) 1.0 else -1.0
        }
      }
    })

  /** Per-row kernel; a null element nulls the whole projection (the
    * expression is null-propagating like vec_dot, not bit-defaulting like
    * the bucketer — a reduced VECTOR with a fabricated component would
    * silently skew every downstream distance).
    */
  def compute(v: ArrayData): Any = {
    val n = v.numElements()
    val sg = signs(n)
    val fl = isFloat
    val out = new Array[Any](planes)
    var p = 0
    while (p < planes) {
      val row = sg(p)
      var s = 0.0
      var d = 0
      while (d < n) {
        if (v.isNullAt(d)) return null
        s += (if (fl) v.getFloat(d).toDouble else v.getDouble(d)) * row(d)
        d += 1
      }
      out(p) = s
      p += 1
    }
    new GenericArrayData(out)
  }

  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rproj", this, classOf[RandomProjection].getName)
    // freshName: the non-nullable-child path of nullSafeCodeGen emits no
    // braces, so a fixed local would collide if two of these expressions
    // land in the same codegen scope.
    val r = ctx.freshName("rprojOut")
    nullSafeCodeGen(ctx, ev, v =>
      s"""Object $r = $ref.compute($v);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $r; }
         |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The `nProbe` nearest IVF cells of a vector, by (cosine DESC, cell-id
  * DESC), as one expression returning `array<int>` in probe order (element
  * 1 = the assignment cell).
  *
  * Why a kernel instead of per-centroid literal-array expressions: the
  * centroid matrix as `array(lit...)` columns generates nLists × dim
  * literal stores of Java source that janino must recompile for EVERY
  * distinct centroid set — each k-means round and the final query each paid
  * seconds of driver JIT. Here the matrix rides along as a reference object
  * (codegen emits one `compute` call; the generated source is identical
  * across rounds, so it compiles once ever), and the assignment stays a
  * map-only scan — no shuffle of the corpus per training round, which is
  * the 100 TB property the literal form also had.
  *
  * Arithmetic parity with the replaced form and the DuckDB oracle:
  * cosine = (Σ_d v[d]·c[d]) / (‖v‖ · ‖c‖), every accumulation
  * left-to-right in array order, float elements promoted to double — so
  * cell choices agree bit-for-bit. A centroid of mismatched dimension
  * scores -inf (never chosen); null vector elements read as 0 (the driver
  * tables carry none — schema-level nullable only).
  */
case class CentroidProbes(child: Expression, centroids: Array[Array[Float]], nProbe: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "centroid_probes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> or array<double> argument, got ${dt.simpleString}")
  }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  /** Centroid norms — same left-to-right double accumulation as the oracle
    * (and the driver-side `math.sqrt(c.map(x => x.toDouble * x).sum)` the
    * literal form used).
    */
  @transient private lazy val centroidNorms: Array[Double] =
    centroids.map { c =>
      var s = 0.0
      var d = 0
      while (d < c.length) { s += c(d).toDouble * c(d); d += 1 }
      math.sqrt(s)
    }

  /** The per-row kernel — called from both eval paths. */
  def compute(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val fl = isFloat
    var vs = 0.0
    var d = 0
    while (d < n) {
      val x = if (v.isNullAt(d)) 0.0 else if (fl) v.getFloat(d).toDouble else v.getDouble(d)
      vs += x * x
      d += 1
    }
    val vn = math.sqrt(vs)
    val k = centroids.length
    val cs = new Array[Double](k)
    var i = 0
    while (i < k) {
      val c = centroids(i)
      if (c.length != n) cs(i) = Double.NegativeInfinity
      else {
        var s = 0.0
        var j = 0
        while (j < n) {
          val x = if (v.isNullAt(j)) 0.0 else if (fl) v.getFloat(j).toDouble else v.getDouble(j)
          s += x * c(j)
          j += 1
        }
        cs(i) = s / (vn * centroidNorms(i))
      }
      i += 1
    }
    // selection of the top nProbe cells by (cs DESC, id DESC); ascending
    // scan with equal-replacement leaves the LARGEST id among ties — the
    // same tie rule as the oracle's ORDER BY cs DESC, i DESC. Comparison is
    // Double.compare, NOT the > operator: a zero-norm vector (or centroid)
    // makes every cosine NaN, and both Spark's sort order and DuckDB's
    // ORDER BY treat NaN as GREATER than every number — `>` would instead
    // evaluate false everywhere and silently pick the lowest cells,
    // diverging from the oracle on such data
    val m = math.min(nProbe, k)
    val used = new Array[Boolean](k)
    val out = new Array[Int](m)
    var r = 0
    while (r < m) {
      var best = -1
      var t = 0
      while (t < k) {
        if (!used(t) && (best < 0 || {
          val cmp = java.lang.Double.compare(cs(t), cs(best))
          cmp > 0 || (cmp == 0 && t > best)
        })) best = t
        t += 1
      }
      used(best) = true
      out(r) = best
      r += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidProbes", this, classOf[CentroidProbes].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $ref.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All `NumSubspaces` PQ code assignments of a vector in ONE expression:
  * `code[m] = argmin_k L2²(v[m·subDim .. (m+1)·subDim), codebook(m)(k))`,
  * ties to the lowest code id.
  *
  * Why a kernel instead of per-codebook literal expressions: the
  * `array_min(array(K literal structs))` form generates M × K × subDim
  * literal stores of Java source that janino recompiles for EVERY distinct
  * codebook — each Lloyd's round, the encode scan, and the LUT build each
  * paid seconds of driver JIT for BOTH `ann_pq` and `ann_ivfpq` (the same
  * anti-pattern [[CentroidProbes]]' docstring names for IVF centroids).
  * Here the codebooks ride as a reference object, the generated source is
  * identical across codebook sets (compiles once ever), and the hot loop
  * is one JIT-compiled pass.
  *
  * Arithmetic parity with the replaced form and the DuckDB oracle: each
  * distance is `((v1−c1)² + (v2−c2)²) + …` summed left-to-right in double
  * (float elements promoted), and the argmin scans codes ascending with a
  * strict `Double.compare` improvement test — exactly the
  * `array_min(struct(d, k))` lexicographic rule, including NaN-greater
  * ordering. Null vector elements read as 0 (the driver tables carry
  * none — schema-level nullable only).
  */
case class SubspaceCodes(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "subspace_codes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> or array<double> argument, got ${dt.simpleString}")
  }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  /** The per-row kernel — called from both eval paths. */
  def compute(v: ArrayData): ArrayData = {
    val fl = isFloat
    val m0 = codebooks.length
    val subDim = if (m0 > 0 && codebooks(0).nonEmpty) codebooks(0)(0).length else 0
    val out = new Array[Int](m0)
    var m = 0
    while (m < m0) {
      val cws = codebooks(m)
      val base = m * subDim
      var best = 0
      var bestD = Double.NaN
      var k = 0
      while (k < cws.length) {
        val cw = cws(k)
        var s = 0.0
        var d = 0
        while (d < subDim) {
          val i = base + d
          val x =
            if (i >= v.numElements() || v.isNullAt(i)) 0.0
            else if (fl) v.getFloat(i).toDouble else v.getDouble(i)
          val diff = x - cw(d)
          s += diff * diff
          d += 1
        }
        // strict-less via Double.compare, scanning k ascending: keeps the
        // LOWEST code id among ties and treats NaN as greater than every
        // number — the array_min(struct(d ASC, k ASC)) rule exactly
        if (k == 0 || java.lang.Double.compare(s, bestD) < 0) { best = k; bestD = s }
        k += 1
      }
      out(m) = best
      m += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("subspaceCodes", this, classOf[SubspaceCodes].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $ref.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The per-query ADC lookup tables as ONE expression: `lut[m][k] =
  * dot(v[m·subDim .. ), codebook(m)(k))` — an M×K nested array built once
  * per query row. Same reference-object rationale as [[SubspaceCodes]]
  * (the literal form recompiled M × K × subDim expression terms per
  * codebook), and the same left-to-right double accumulation as the
  * `element_at(sub, d).cast(double) * lit(c)` chains it replaces, so every
  * table entry replays bit-for-bit in the oracle.
  */
case class SubspaceLuts(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "subspace_luts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> or array<double> argument, got ${dt.simpleString}")
  }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  /** The per-row kernel — called from both eval paths. */
  def compute(v: ArrayData): ArrayData = {
    val fl = isFloat
    val m0 = codebooks.length
    val subDim = if (m0 > 0 && codebooks(0).nonEmpty) codebooks(0)(0).length else 0
    val out = new Array[Any](m0)
    var m = 0
    while (m < m0) {
      val cws = codebooks(m)
      val base = m * subDim
      val luts = new Array[Any](cws.length)
      var k = 0
      while (k < cws.length) {
        val cw = cws(k)
        var s = 0.0
        var d = 0
        while (d < subDim) {
          val i = base + d
          val x =
            if (i >= v.numElements() || v.isNullAt(i)) 0.0
            else if (fl) v.getFloat(i).toDouble else v.getDouble(i)
          s += x * cw(d)
          d += 1
        }
        luts(k) = s
        k += 1
      }
      out(m) = new GenericArrayData(luts)
      m += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("subspaceLuts", this, classOf[SubspaceLuts].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $ref.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Σ_m ‖codebook(m)(code_m)‖² — the cached reconstruction norm² of an
  * encoded vector, from its `array<int>` code column. Norms are
  * precomputed per (m, k) with the same left-to-right double accumulation
  * as the literal-array lookup form this replaces, and summed ascending
  * over subspaces; codebooks ride as a reference object for the same
  * recompile reason as [[SubspaceCodes]]. An out-of-range code yields NULL
  * (can't happen for codes this engine produced — defensive only, the
  * column is user-visible in the index artifact).
  */
case class CodesReconNorm(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "codes_recon_norm"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<int> argument, got ${dt.simpleString}")
  }

  /** normSq(m)(k) = ((c1² + c2²) + …) left-to-right, like the oracle. */
  @transient private lazy val normSq: Array[Array[Double]] =
    codebooks.map(_.map { cw =>
      var s = 0.0
      var d = 0
      while (d < cw.length) { s += cw(d).toDouble * cw(d); d += 1 }
      s
    })

  /** The per-row kernel — called from both eval paths. */
  def compute(codes: ArrayData): Any = {
    val m0 = codebooks.length
    if (codes.numElements() < m0) return null
    var s = 0.0
    var m = 0
    while (m < m0) {
      if (codes.isNullAt(m)) return null
      val k = codes.getInt(m)
      if (k < 0 || k >= normSq(m).length) return null
      s += normSq(m)(k)
      m += 1
    }
    s
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codesReconNorm", this, classOf[CodesReconNorm].getName)
    // freshName for the same duplicate-local reason as RandomProjection.
    val r = ctx.freshName("reconNorm")
    nullSafeCodeGen(ctx, ev, v =>
      s"""Object $r = $ref.compute($v);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((java.lang.Double) $r).doubleValue(); }
         |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {

  /** Codegen'd Σ aᵢbᵢ in double over two float arrays. */
  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(
      FloatVecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** ‖a‖₂ via the same kernel (one self-dot + sqrt). */
  def vecNorm(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(vecDot(a, a))

  /** Array of all `tables` LSH bucket ids for a vector (see
    * [[HyperplaneBuckets]]).
    */
  def hyperplaneBuckets(v: Column, tables: Int, planes: Int): Column =
    ColumnBridge.column(HyperplaneBuckets(ColumnBridge.expression(v), tables, planes))

  /** JL random projection to `planes` signed-sum components (see
    * [[RandomProjection]]).
    */
  def randomProjection(v: Column, table: Int, planes: Int): Column =
    ColumnBridge.column(RandomProjection(ColumnBridge.expression(v), table, planes))

  /** Top-`nProbe` IVF cells of a vector in probe order (see
    * [[CentroidProbes]]).
    */
  def centroidProbes(v: Column, centroids: Array[Array[Float]], nProbe: Int): Column =
    ColumnBridge.column(CentroidProbes(ColumnBridge.expression(v), centroids, nProbe))

  /** All PQ subspace code assignments of a vector (see [[SubspaceCodes]]). */
  def subspaceCodes(v: Column, codebooks: Array[Array[Array[Float]]]): Column =
    ColumnBridge.column(SubspaceCodes(ColumnBridge.expression(v), codebooks))

  /** Per-query M×K ADC lookup tables (see [[SubspaceLuts]]). */
  def subspaceLuts(v: Column, codebooks: Array[Array[Array[Float]]]): Column =
    ColumnBridge.column(SubspaceLuts(ColumnBridge.expression(v), codebooks))

  /** Reconstruction norm² of an encoded vector from its code array (see
    * [[CodesReconNorm]]).
    */
  def codesReconNorm(codes: Column, codebooks: Array[Array[Array[Float]]]): Column =
    ColumnBridge.column(CodesReconNorm(ColumnBridge.expression(codes), codebooks))
}
