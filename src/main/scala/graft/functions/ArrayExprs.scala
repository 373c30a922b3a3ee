package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the hot inner loops of the dedup /
  * similarity operators.
  *
  * Why not `functions.transform/aggregate/zip_with`: Spark's higher-order
  * functions are evaluated interpreted (no whole-stage codegen), with a
  * lambda-variable binding and boxing per array element. For k=64 minhash
  * passes over every shingle of every document that overhead dominates
  * end-to-end runtime (measured ~10× at sf0.1). These expressions do the
  * same work in one tight JVM loop per row using Spark's own XXH64.
  *
  * They are `CodegenFallback` (one virtual call per row — the loop inside
  * is plain JVM code, which is what matters; a full doGenCode would only
  * save the call). All are deterministic, null-in → null-out, and
  * side-effect free, so Catalyst can still prune/push/reorder around
  * them.
  */
object ArrayExprs {

  private val SEED = 42L // same default seed as Spark's xxhash64()

  // ---- engine-portable md5-derived hashing -----------------------------------
  // The xxhash64-based expressions below are the fast path, but xxhash64
  // has no DuckDB twin, so results derived from it can only get a
  // rows-only oracle check. These helpers define a base hash the oracle
  // CAN reproduce: the lower 64 bits of MD5 — little-endian over digest
  // bytes 8..15, bit-identical to DuckDB's `md5_number_lower(s)` — and
  // MinHash permutations as plain modular arithmetic over the Mersenne
  // prime p = 2^61−1, exactly computable in DuckDB HUGEINT SQL.

  private[functions] val MersenneP: Long = (1L << 61) - 1

  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** A reset, thread-confined MD5 instance (avoids per-row allocation). */
  private[functions] def md5Digest(): java.security.MessageDigest = {
    val m = md5Local.get(); m.reset(); m
  }

  /** Finish the digest and take bytes 8..15 little-endian — the exact
    * value of DuckDB `md5_number_lower` on the same input bytes.
    */
  private[functions] def md5Lower64(md: java.security.MessageDigest): Long = {
    val d = md.digest()
    var h = 0L
    var j = 7
    while (j >= 0) { h = (h << 8) | (d(8 + j) & 0xffL); j -= 1 }
    h
  }

  private[functions] def md5Lower64(bytes: Array[Byte]): Long = {
    val md = md5Digest(); md.update(bytes); md5Lower64(md)
  }

  /** (a·b) mod 2^61−1 for a,b ∈ [0, 2^61), exact: the 128-bit product is
    * folded with 2^64 ≡ 8 (mod p). hi < 2^58 so hi·8 cannot overflow.
    */
  private[functions] def mulmodP(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    ((hi << 3) % MersenneP + java.lang.Long.remainderUnsigned(a * b, MersenneP)) % MersenneP
  }

  /** Universal-hash permutation constants, derived from md5 so the oracle
    * can derive the identical values in SQL:
    * aᵢ = md5_number_lower("a"+i) mod (p−1) + 1, bᵢ = md5_number_lower("b"+i) mod p.
    */
  private[functions] def permParams(k: Int): (Array[Long], Array[Long]) = {
    val a = new Array[Long](k)
    val b = new Array[Long](k)
    var i = 0
    while (i < k) {
      a(i) = java.lang.Long.remainderUnsigned(
        md5Lower64(("a" + i).getBytes("UTF-8")), MersenneP - 1) + 1
      b(i) = java.lang.Long.remainderUnsigned(
        md5Lower64(("b" + i).getBytes("UTF-8")), MersenneP)
      i += 1
    }
    (a, b)
  }

  /** Distinct xxhash64 fingerprints of all `n`-token windows of a
    * string-token array. Equivalent (up to 64-bit hash collisions, odds
    * ~2^-45 at 10^6 shingles) to
    * `array_distinct(transform(windows, concat_ws(" ", ...)))` followed
    * by `xxhash64(shingle)` — but hashes tokens in place instead of
    * materializing shingle strings.
    */
  case class ShingleHashes(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true

    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val len = arr.numElements()
      val m = len - n + 1
      if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
      // Hash each token once, then chain-combine per window.
      val th = new Array[Long](len)
      var i = 0
      while (i < len) {
        th(i) = if (arr.isNullAt(i)) SEED
          else XXH64.hashUTF8String(arr.getUTF8String(i), SEED)
        i += 1
      }
      val ws = new Array[Long](m)
      i = 0
      while (i < m) {
        var acc = SEED
        var j = i
        while (j < i + n) { acc = XXH64.hashLong(th(j), acc); j += 1 }
        ws(i) = acc
        i += 1
      }
      // Distinct via sort + unique scan (order is irrelevant downstream).
      java.util.Arrays.sort(ws)
      var u = 1
      i = 1
      while (i < m) {
        if (ws(i) != ws(i - 1)) { ws(u) = ws(i); u += 1 }
        i += 1
      }
      new GenericArrayData(java.util.Arrays.copyOf(ws, u))
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** All unordered pairs (id1 < id2) of a long-id array — the inverted
    * index's bucket→candidate-pairs step. Emitting pairs directly from
    * each posting list replaces a two-sided self-join on the shingle
    * hash: one shuffle (the posting-list groupBy, map-side combined)
    * instead of two join-side exchanges. Output size is
    * df·(df−1)/2 per bucket — same blow-up the self-join had; cap df
    * upstream (ngramJaccardCappedAt) for boilerplate-heavy corpora.
    */
  case class SortedPairs(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(
      StructType(Seq(
        StructField("id1", LongType, nullable = false),
        StructField("id2", LongType, nullable = false))),
      containsNull = false)
    override def nullIntolerant: Boolean = true

    override protected def nullSafeEval(input: Any): Any = {
      val ids = input.asInstanceOf[ArrayData].toLongArray()
      java.util.Arrays.sort(ids)
      val m = ids.length
      require(m <= 65536,
        s"posting list df=$m exceeds the pair-expansion bound; apply a df cap")
      val out = new Array[Any](m * (m - 1) / 2)
      var k = 0
      var i = 0
      while (i < m) {
        var j = i + 1
        while (j < m) {
          out(k) = InternalRow(ids(i), ids(j))
          k += 1
          j += 1
        }
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** SortedPairs over (id, n) structs: emits (id1, id2, ns = n1+n2) with
    * id1 < id2. Carrying each doc's shingle count inside the posting
    * list lets the Jaccard denominator |A|+|B| ride along as part of the
    * pair groupBy key, eliminating the two post-aggregation size joins
    * (and the corpus-wide checkpoint those joins forced) from the
    * inverted-index plan.
    *
    * `tau` applies the exact length filter of the similarity-join
    * literature (PPJoin's size bound): Jaccard(A,B) ≤ min/max of the set
    * sizes, so any pair with min(n1,n2) < τ·max(n1,n2) is dropped at
    * emission — before it costs a shuffle row — without changing the
    * result of a downstream `jaccard >= τ` filter.
    */
  case class SortedPairsN(child: Expression, tau: Double)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(
      StructType(Seq(
        StructField("id1", LongType, nullable = false),
        StructField("id2", LongType, nullable = false),
        StructField("ns", IntegerType, nullable = false))),
      containsNull = false)
    override def nullIntolerant: Boolean = true

    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val m = arr.numElements()
      val ids = new Array[Long](m)
      val ns = new Array[Int](m)
      var i = 0
      while (i < m) {
        val st = arr.getStruct(i, 2)
        ids(i) = st.getLong(0)
        ns(i) = st.getInt(1)
        i += 1
      }
      // insertion sort by id, n follows (lists are short: df per shingle)
      i = 1
      while (i < m) {
        val id = ids(i); val n = ns(i)
        var j = i - 1
        while (j >= 0 && ids(j) > id) { ids(j + 1) = ids(j); ns(j + 1) = ns(j); j -= 1 }
        ids(j + 1) = id; ns(j + 1) = n
        i += 1
      }
      // m*(m-1)/2 overflows Int past m = 65536 (the resulting negative
      // allocation would kill the query); a posting list that long means
      // the caller skipped the df-cap scale guard — fail with the dial
      // to turn, not an allocator crash
      require(m <= 65536,
        s"posting list df=$m exceeds the pair-expansion bound; " +
          "apply a df cap (ngramJaccardCappedAt / ngramJaccardAutoCapped)")
      val out = new Array[Any](m * (m - 1) / 2)
      var k = 0
      i = 0
      while (i < m) {
        var j = i + 1
        while (j < m) {
          val lo = math.min(ns(i), ns(j)).toDouble
          val hi = math.max(ns(i), ns(j)).toDouble
          if (lo >= tau * hi) {
            out(k) = InternalRow(ids(i), ids(j), ns(i) + ns(j))
            k += 1
          }
          j += 1
        }
        i += 1
      }
      if (k == out.length) new GenericArrayData(out)
      else {
        val trimmed = new Array[Any](k)
        System.arraycopy(out, 0, trimmed, 0, k)
        new GenericArrayData(trimmed)
      }
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** [[SortedPairsN]] variant for ASYMMETRIC similarity: emits
    * (id1, id2, n1, n2) with id1 < id2 and each side's own set size, so
    * containment I/min(n1,n2) (and either directed ratio) can be
    * computed on the pair key. No length prune — unlike Jaccard,
    * containment has no size-ratio bound (a 10-shingle excerpt can be
    * fully contained in a 10,000-shingle document), so every co-bucket
    * pair is a legitimate candidate; posting-list df caps remain the
    * scale guard.
    */
  case class SortedPairsBoth(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(
      StructType(Seq(
        StructField("id1", LongType, nullable = false),
        StructField("id2", LongType, nullable = false),
        StructField("n1", IntegerType, nullable = false),
        StructField("n2", IntegerType, nullable = false))),
      containsNull = false)
    override def nullIntolerant: Boolean = true

    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val m = arr.numElements()
      val ids = new Array[Long](m)
      val ns = new Array[Int](m)
      var i = 0
      while (i < m) {
        val st = arr.getStruct(i, 2)
        ids(i) = st.getLong(0)
        ns(i) = st.getInt(1)
        i += 1
      }
      i = 1
      while (i < m) {
        val id = ids(i); val n = ns(i)
        var j = i - 1
        while (j >= 0 && ids(j) > id) { ids(j + 1) = ids(j); ns(j + 1) = ns(j); j -= 1 }
        ids(j + 1) = id; ns(j + 1) = n
        i += 1
      }
      // same Int-overflow bound as SortedPairsN — and containment has no
      // length prune at all, so the df cap is the ONLY guard here
      require(m <= 65536,
        s"posting list df=$m exceeds the pair-expansion bound; " +
          "apply a df cap (containmentCappedAt / ngramJaccardCappedAt)")
      val out = new Array[Any](m * (m - 1) / 2)
      var k = 0
      i = 0
      while (i < m) {
        var j = i + 1
        while (j < m) {
          out(k) = InternalRow(ids(i), ids(j), ns(i), ns(j))
          k += 1
          j += 1
        }
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Containment-join candidate generator — [[SortedPairsBoth]] gated by
    * the PREFIX-FILTER principle. Input is
    * `array<struct<doc_id: long, n: int, probe: boolean>>` for one
    * shingle's posting list, where `probe` marks docs that posted this
    * shingle from their (1−τ)-prefix (the `⌊n − ⌈τ·n⌉⌋ + 1` smallest
    * shingles in canonical hash order). A pair can reach containment
    * ≥ τ only if its MIN-size side shares a prefix shingle with the
    * other side's FULL set — if none of the min side's first
    * `n − ⌈τ·n⌉ + 1` sorted shingles hits, at most `⌈τ·n⌉ − 1 < τ·n`
    * of its shingles can intersect, a contradiction. So emitting only
    * pairs whose (n, doc_id)-lexicographic-min side has `probe = true`
    * is LOSSLESS for the τ threshold while cutting the quadratic
    * expansion to the probe fraction (≈ (1−τ) of postings). Ties in n
    * are safe: either side is then a min side, and the lex order picks
    * one deterministically.
    */
  case class ProbePairsBoth(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(
      StructType(Seq(
        StructField("id1", LongType, nullable = false),
        StructField("id2", LongType, nullable = false),
        StructField("n1", IntegerType, nullable = false),
        StructField("n2", IntegerType, nullable = false))),
      containsNull = false)
    override def nullIntolerant: Boolean = true

    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val m = arr.numElements()
      val ids = new Array[Long](m)
      val ns = new Array[Int](m)
      val probe = new Array[Boolean](m)
      var i = 0
      while (i < m) {
        val st = arr.getStruct(i, 3)
        ids(i) = st.getLong(0)
        ns(i) = st.getInt(1)
        probe(i) = st.getBoolean(2)
        i += 1
      }
      require(m <= 65536,
        s"posting list df=$m exceeds the pair-expansion bound; " +
          "apply a df cap (containmentCappedAt / ngramJaccardCappedAt)")
      val out = new scala.collection.mutable.ArrayBuffer[Any](m)
      i = 0
      while (i < m) {
        var j = i + 1
        while (j < m) {
          // lexicographic-min side by (n, doc_id)
          val iMin = ns(i) < ns(j) || (ns(i) == ns(j) && ids(i) < ids(j))
          if (if (iMin) probe(i) else probe(j)) {
            if (ids(i) < ids(j)) out += InternalRow(ids(i), ids(j), ns(i), ns(j))
            else out += InternalRow(ids(j), ids(i), ns(j), ns(i))
          }
          j += 1
        }
        i += 1
      }
      new GenericArrayData(out.toArray)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Merge-count of two SORTED long arrays — the exact-verify kernel for
    * prefix-filtered containment candidates: |A ∩ B| in O(n1 + n2) with
    * zero allocation. Inputs MUST be sorted ascending (callers sort once
    * per doc, not per pair).
    */
  case class SortedIntersectCount(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def nullIntolerant: Boolean = true

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val xs = a.asInstanceOf[ArrayData]
      val ys = b.asInstanceOf[ArrayData]
      val nx = xs.numElements()
      val ny = ys.numElements()
      var i = 0; var j = 0; var n = 0
      while (i < nx && j < ny) {
        val x = xs.getLong(i); val y = ys.getLong(j)
        if (x == y) { n += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
      n
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Minimal cover span over a SORTED packed (pos, slot) event list:
    * the smallest max(pos)−min(pos) of any window containing at least
    * one event of EVERY slot 0..slots-1 — the classic two-pointer
    * minimal-window scan, O(n) per row where an m-way position join is
    * O(∏ tf_i). Events pack as pos * 64 + slot (slot < 64; sorting the
    * packed longs IS position order, ties slot-ordered). Null if some
    * slot never occurs. This is the multi-term proximity kernel: at
    * 100 TB the per-document event list is bounded by the document's
    * matched-term occurrences, and the scan is expression-local — no
    * joins, no shuffles beyond the per-doc collect.
    */
  case class MinCoverSpan(child: Expression, slots: Int)
      extends UnaryExpression with CodegenFallback {
    require(slots >= 1 && slots <= 64, s"slots must be 1..64, got $slots")
    override def dataType: DataType = IntegerType
    override def nullIntolerant: Boolean = true
    // null on NON-null input too (a slot never occurs) — without this
    // the default child-derived nullability lets generated projections
    // unbox the null result (NPE)
    override def nullable: Boolean = true

    override protected def nullSafeEval(input: Any): Any = {
      val xs = input.asInstanceOf[ArrayData]
      val n = xs.numElements()
      val seen = new Array[Int](slots)
      var covered = 0
      var lo = 0
      var best = -1
      var hi = 0
      while (hi < n) {
        val e = xs.getLong(hi)
        val s = (e & 63L).toInt
        if (s < slots) {
          if (seen(s) == 0) covered += 1
          seen(s) += 1
        }
        // shrink from the left while still covered; record the window
        while (covered == slots) {
          val span = ((e >> 6) - (xs.getLong(lo) >> 6)).toInt
          if (best < 0 || span < best) best = span
          val f = (xs.getLong(lo) & 63L).toInt
          if (f < slots) {
            seen(f) -= 1
            if (seen(f) == 0) covered -= 1
          }
          lo += 1
        }
        hi += 1
      }
      if (best < 0) null else best
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** k-permutation MinHash signature over an array of shingle hashes:
    * sig(i) = min over h of xxhash64(h, seed = i). One pass per seed over
    * a primitive long array — no string re-hashing, no boxing.
    */
  case class MinHashSig(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true

    override protected def nullSafeEval(input: Any): Any = {
      val hs = input.asInstanceOf[ArrayData].toLongArray()
      if (hs.isEmpty) return null
      val sig = new Array[Long](k)
      var i = 0
      while (i < k) {
        var mn = Long.MaxValue
        var j = 0
        while (j < hs.length) {
          val v = XXH64.hashLong(hs(j), i.toLong)
          if (v < mn) mn = v
          j += 1
        }
        sig(i) = mn
        i += 1
      }
      new GenericArrayData(sig)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** 64-bit SimHash of a string-token array: each token's xxhash64 votes
    * ±1 per bit position; output bit b is set iff the b-votes are
    * strictly positive. Single pass over the tokens.
    */
  case class SimHash64(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true

    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val len = arr.numElements()
      val votes = new Array[Int](64)
      var i = 0
      while (i < len) {
        if (!arr.isNullAt(i)) {
          val h = XXH64.hashUTF8String(arr.getUTF8String(i), SEED)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        i += 1
      }
      var fp = 0L
      var b = 0
      while (b < 64) {
        if (votes(b) > 0) fp |= (1L << b)
        b += 1
      }
      fp
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** k-permutation MinHash signature computed directly from a
    * string-token array via the engine-portable md5 base hash:
    * sig(i) = min over n-token windows of (aᵢ·h + bᵢ) mod p, where
    * h = md5_number_lower(shingle string) mod p. Null when the array has
    * no full window (< n tokens) so shingle-less docs vanish, matching
    * the relational oracle. One MD5 per window + k mulmods — still a
    * single scan-side pass per row, no shuffle.
    *
    * Duplicate windows need no dedup: min over a multiset equals min
    * over its support.
    */
  case class MinHashSigMd5(child: Expression, n: Int, k: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def nullIntolerant: Boolean = true

    @transient private lazy val perms = ArrayExprs.permParams(k)

    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val len = arr.numElements()
      val m = len - n + 1
      if (m <= 0) return null
      val (pa, pb) = perms
      val tb = new Array[Array[Byte]](len)
      var i = 0
      while (i < len) {
        tb(i) = if (arr.isNullAt(i)) Array.emptyByteArray else arr.getUTF8String(i).getBytes
        i += 1
      }
      val sig = Array.fill(k)(Long.MaxValue)
      i = 0
      while (i < m) {
        val md = ArrayExprs.md5Digest()
        var j = i
        while (j < i + n) {
          if (j > i) md.update(' '.toByte)
          md.update(tb(j))
          j += 1
        }
        val h = java.lang.Long.remainderUnsigned(ArrayExprs.md5Lower64(md), ArrayExprs.MersenneP)
        var q = 0
        while (q < k) {
          val v = (ArrayExprs.mulmodP(pa(q), h) + pb(q)) % ArrayExprs.MersenneP
          if (v < sig(q)) sig(q) = v
          q += 1
        }
        i += 1
      }
      new GenericArrayData(sig)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** SimHash over the md5 base hash (see SimHash64 for the algorithm):
    * bit b of each token's md5_number_lower votes ±1; output bit set iff
    * votes strictly positive. Engine-portable — the oracle reproduces the
    * fingerprint with `(md5_number_lower(tok) >> b) & 1` arithmetic.
    */
  case class SimHash64Md5(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true

    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val len = arr.numElements()
      val votes = new Array[Int](64)
      var i = 0
      while (i < len) {
        if (!arr.isNullAt(i)) {
          val h = ArrayExprs.md5Lower64(arr.getUTF8String(i).getBytes)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        i += 1
      }
      var fp = 0L
      var b = 0
      while (b < 64) {
        if (votes(b) > 0) fp |= (1L << b)
        b += 1
      }
      fp
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** One-pass token statistics for the Gopher-style rules: distinct
    * token count, max token frequency, and stopword hits in a single
    * O(n) hash-counting sweep. Replaces the array-HOF formulation
    * `array_max(transform(array_distinct(toks), t => size(filter(toks,
    * _ === t))))`, whose O(distinct·n) per-row cost made the rule pass
    * the most expensive scan in the curation pipeline. Same integers —
    * the DuckDB twin's list arithmetic is unchanged — and the same
    * null semantics: an empty token array yields top_tok NULL (as
    * `array_max([])` / `list_max([])` do), n_distinct 0, stop_hits 0.
    */
  case class TokenStats(child: Expression, stopwords: Seq[String])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StructType(Seq(
      StructField("n_distinct", LongType, nullable = false),
      StructField("top_tok", LongType, nullable = true),
      StructField("stop_hits", LongType, nullable = false)))
    override def nullIntolerant: Boolean = true

    @transient private lazy val stopSet: java.util.HashSet[org.apache.spark.unsafe.types.UTF8String] = {
      val s = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
      stopwords.foreach(w => s.add(org.apache.spark.unsafe.types.UTF8String.fromString(w)))
      s
    }

    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (n == 0) return InternalRow(0L, null, 0L)
      val counts = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Int](n * 2)
      var top = 0
      var stop = 0L
      var i = 0
      while (i < n) {
        val t = arr.getUTF8String(i)
        val c = counts.getOrDefault(t, 0) + 1
        counts.put(t, c)
        if (c > top) top = c
        if (stopSet.contains(t)) stop += 1
        i += 1
      }
      InternalRow(counts.size.toLong, top.toLong, stop)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Unsigned (md5_number_lower(s) mod m) of a string — the
    * engine-portable pseudo-random draw used for deterministic sampling:
    * DuckDB computes the identical value as
    * `md5_number_lower(s) % m` (UBIGINT arithmetic).
    */
  case class Md5Mod(child: Expression, m: Long)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true

    override protected def nullSafeEval(input: Any): Any =
      java.lang.Long.remainderUnsigned(
        ArrayExprs.md5Lower64(
          input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes), m)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Dot product of two float arrays, accumulated left-to-right in
    * double — bit-identical to
    * `aggregate(zip_with(a, b, (x,y) => x.cast(double)*y.cast(double)), 0.0, _+_)`
    * and to DuckDB's `list_sum(list_transform(...))` fold, which the
    * oracle relies on. Null (or length-mismatched) input → null, matching
    * zip_with's null padding semantics.
    */
  case class DotProductF(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true

    override protected def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      if (a.numElements() != b.numElements()) return null
      var acc = 0.0
      var i = 0
      val n = a.numElements()
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
        i += 1
      }
      acc
    }

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** L2 norm of a float array (same fold shape/order as DotProductF). */
  case class L2NormF(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true

    override protected def nullSafeEval(input: Any): Any = {
      val a = input.asInstanceOf[ArrayData]
      var acc = 0.0
      var i = 0
      val n = a.numElements()
      while (i < n) {
        if (a.isNullAt(i)) return null
        val v = a.getFloat(i).toDouble
        acc += v * v
        i += 1
      }
      math.sqrt(acc)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Random-hyperplane LSH bucket ids of a float vector — one bucket per
    * table, `bits` sign-bits each. Hyperplane components are derived
    * deterministically AND engine-portably: component (t,b,j) is the
    * signed reading of md5_number_lower("plane:t:b:j") divided by
    * Long.MaxValue → double in [-1, 1), which the DuckDB oracle
    * re-derives exactly. No RNG state ships with the plan; planes are
    * computed once per expression instance per vector dimension, NOT
    * per row (the HOF formulation re-hashed tables×bits×dim components
    * for every vector).
    */
  case class LshBuckets(child: Expression, tables: Int, bits: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true

    // Benign-race cache: concurrent first evals recompute identical
    // values; reference assignment is atomic.
    @transient private var planeDim: Int = -1
    @transient private var planes: Array[Array[Double]] = _

    private def planesFor(dim: Int): Array[Array[Double]] = {
      // `planes == null` guard: deserialization zeroes planeDim, so a
      // zero-length vector would otherwise match planeDim==0 and NPE.
      if (planes == null || planeDim != dim) {
        val p = Array.tabulate(tables * bits) { tb =>
          val t = tb / bits
          val b = tb % bits
          Array.tabulate(dim) { j =>
            ArrayExprs.md5Lower64(s"plane:$t:$b:$j".getBytes("UTF-8"))
              .toDouble / Long.MaxValue.toDouble
          }
        }
        planes = p
        planeDim = dim
      }
      planes
    }

    override protected def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val dim = v.numElements()
      val p = planesFor(dim)
      val out = new Array[Long](tables)
      var t = 0
      while (t < tables) {
        var bucket = 0L
        var b = 0
        while (b < bits) {
          val plane = p(t * bits + b)
          var proj = 0.0
          var j = 0
          while (j < dim) { proj += v.getFloat(j).toDouble * plane(j); j += 1 }
          if (proj >= 0) bucket |= (1L << b)
          b += 1
        }
        out(t) = bucket
        t += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Index of the nearest centroid by cosine similarity. The centroid
    * matrix rides inside the expression (k×dim floats, serialized with
    * the plan like a broadcast) so assignment is pure scan work — the
    * IVF coarse-quantizer pattern: no join, no shuffle, one pass.
    */
  case class NearestCentroid(child: Expression, centroids: Seq[Array[Float]])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def nullIntolerant: Boolean = true

    // Array-backed copy for the per-row loop: a List-typed `centroids`
    // (Seq.tabulate builds one) would make centroids(c) an O(c) walk
    @transient private lazy val cents: Array[Array[Float]] = centroids.toArray
    @transient private lazy val norms: Array[Double] =
      centroids.map { c =>
        var s = 0.0; var i = 0
        while (i < c.length) { s += c(i).toDouble * c(i).toDouble; i += 1 }
        math.sqrt(s)
      }.toArray

    override protected def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val dim = v.numElements()
      // A malformed embedding must FAIL, not silently score a truncated
      // prefix into a plausible-but-wrong assignment.
      if (cents.nonEmpty && dim != cents(0).length)
        throw new IllegalArgumentException(
          s"NearestCentroid: embedding dimension $dim != centroid dimension ${cents(0).length}")
      var best = 0
      var bestScore = Double.NegativeInfinity
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var dot = 0.0
        var j = 0
        while (j < cent.length) { dot += v.getFloat(j).toDouble * cent(j).toDouble; j += 1 }
        val score = if (norms(c) == 0.0) Double.NegativeInfinity else dot / norms(c)
        if (score > bestScore) { bestScore = score; best = c }
        c += 1
      }
      best
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Top-`p` nearest centroids by cosine similarity, ordered score desc
    * then cid asc — multi-probe ASSIGNMENT for SemDeDup ([[Similarity
    * .semanticDedupAt]]'s `nprobeAssign` dial): a vector near a cell
    * boundary lands in BOTH adjacent cells, so a near-dup pair split by
    * the boundary still meets in a shared cell. Same scan-local shape
    * as [[NearestCentroid]] (k×dim matrix rides in the plan); the
    * ordering matches the oracle twin's `row_number() OVER (ORDER BY
    * score DESC, cid)` exactly, including the zero-norm → −∞ guard.
    */
  case class NearestCentroids(child: Expression, centroids: Seq[Array[Float]], p: Int)
      extends UnaryExpression with CodegenFallback {
    require(p >= 1, s"NearestCentroids: p must be ≥ 1, got $p")
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullIntolerant: Boolean = true

    @transient private lazy val cents: Array[Array[Float]] = centroids.toArray
    @transient private lazy val norms: Array[Double] =
      centroids.map { c =>
        var s = 0.0; var i = 0
        while (i < c.length) { s += c(i).toDouble * c(i).toDouble; i += 1 }
        math.sqrt(s)
      }.toArray

    override protected def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val dim = v.numElements()
      if (cents.nonEmpty && dim != cents(0).length)
        throw new IllegalArgumentException(
          s"NearestCentroids: embedding dimension $dim != centroid dimension ${cents(0).length}")
      val k = cents.length
      val scores = new Array[Double](k)
      var c = 0
      while (c < k) {
        val cent = cents(c)
        var dot = 0.0
        var j = 0
        while (j < cent.length) { dot += v.getFloat(j).toDouble * cent(j).toDouble; j += 1 }
        scores(c) = if (norms(c) == 0.0) Double.NegativeInfinity else dot / norms(c)
        c += 1
      }
      val take = math.min(p, k)
      val out = new Array[Any](take)
      val used = new Array[Boolean](k)
      var r = 0
      while (r < take) { // selection pass: k is the bounded cell count
        var best = -1
        var bestScore = Double.NegativeInfinity
        var i = 0
        while (i < k) {
          // the first unused index always becomes a candidate: all-(−∞)
          // scores (every centroid zero-norm) still select the lowest
          // cid instead of leaving best = −1
          if (!used(i) && (best == -1 || scores(i) > bestScore)) {
            bestScore = scores(i); best = i
          }
          i += 1
        }
        used(best) = true
        out(r) = best
        r += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Squared-L2 nearest centroid over DOUBLE centroids (the Lloyd
    * assignment kernel): returns struct(cid, dist2) where dist2 is the
    * left-to-right fold of (double(x_i) − c_i)² — the same accumulation
    * order as DuckDB's `list_sum` over an index transform, so distances
    * are bit-identical cross-engine (see [[DotProductF]]). Ties break to
    * the LOWEST cid, matching the oracle's `ORDER BY d2, cid` pick.
    * Unlike [[NearestCentroid]] (cosine, float centroids — the IVF probe
    * kernel) this keeps centroid precision at double: k-means centroids
    * are means of floats, and rounding them back to float would make the
    * assignment diverge from the SQL twin's double arithmetic.
    */
  case class NearestCentroidSq(child: Expression, centroids: Seq[Array[Double]])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StructType(Seq(
      StructField("cid", IntegerType, nullable = false),
      StructField("dist2", DoubleType, nullable = false)))
    override def nullIntolerant: Boolean = true

    @transient private lazy val cents: Array[Array[Double]] = centroids.toArray

    override protected def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val dim = v.numElements()
      // Same dimension contract as [[NearestCentroid]]: fail loudly.
      if (cents.nonEmpty && dim != cents(0).length)
        throw new IllegalArgumentException(
          s"NearestCentroidSq: embedding dimension $dim != centroid dimension ${cents(0).length}")
      var best = -1
      var bestD2 = Double.PositiveInfinity
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var acc = 0.0
        var j = 0
        while (j < cent.length) {
          val d = v.getFloat(j).toDouble - cent(j)
          acc += d * d
          j += 1
        }
        // strict < keeps the FIRST (lowest) cid on exact ties
        if (acc < bestD2) { bestD2 = acc; best = c }
        c += 1
      }
      InternalRow(best, bestD2)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** [[NearestCentroidSq]] over a DOUBLE-typed input array — the
    * residual-PQ encode kernel ([[graft.ops.Pq.ivfPqResidual]]): the
    * residual (vec − coarse centroid) is computed in double and must be
    * quantized WITHOUT a float round-trip, or the engine and the SQL
    * twin would disagree in the last ulp. Same ranking contract:
    * strict < keeps the lowest code on exact ties.
    */
  case class NearestCentroidSqD(child: Expression, centroids: Seq[Array[Double]])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StructType(Seq(
      StructField("cid", IntegerType, nullable = false),
      StructField("dist2", DoubleType, nullable = false)))
    override def nullIntolerant: Boolean = true

    @transient private lazy val cents: Array[Array[Double]] = centroids.toArray

    override protected def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val dim = v.numElements()
      if (cents.nonEmpty && dim != cents(0).length)
        throw new IllegalArgumentException(
          s"NearestCentroidSqD: input dimension $dim != centroid dimension ${cents(0).length}")
      var best = -1
      var bestD2 = Double.PositiveInfinity
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var acc = 0.0
        var j = 0
        while (j < cent.length) {
          val d = v.getDouble(j) - cent(j)
          acc += d * d
          j += 1
        }
        if (acc < bestD2) { bestD2 = acc; best = c }
        c += 1
      }
      InternalRow(best, bestD2)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  // ---- Column-API wrappers ---------------------------------------------------
  private def c(e: Expression): Column = bridge.column(e)
  private def e(col: Column): Expression = bridge.expression(col)

  def shingleHashes(tokens: Column, n: Int): Column = c(ShingleHashes(e(tokens), n))
  def minHashSig(hashes: Column, k: Int): Column = c(MinHashSig(e(hashes), k))
  def minHashSigMd5(tokens: Column, n: Int, k: Int): Column = c(MinHashSigMd5(e(tokens), n, k))
  def simHash64(tokens: Column): Column = c(SimHash64(e(tokens)))
  def simHash64Md5(tokens: Column): Column = c(SimHash64Md5(e(tokens)))
  def md5Mod(s: Column, m: Long): Column = c(Md5Mod(e(s), m))
  def tokenStats(toks: Column, stopwords: Seq[String]): Column =
    c(TokenStats(e(toks), stopwords))
  def sortedPairs(ids: Column): Column = c(SortedPairs(e(ids)))
  def sortedPairsN(idNs: Column, tau: Double = 0.0): Column = c(SortedPairsN(e(idNs), tau))
  def sortedPairsBoth(idNs: Column): Column = c(SortedPairsBoth(e(idNs)))
  def probePairsBoth(idNs: Column): Column = c(ProbePairsBoth(e(idNs)))
  def sortedIntersectCount(a: Column, b: Column): Column = c(SortedIntersectCount(e(a), e(b)))
  def minCoverSpan(events: Column, slots: Int): Column = c(MinCoverSpan(e(events), slots))
  def dotF(a: Column, b: Column): Column = c(DotProductF(e(a), e(b)))
  def l2normF(a: Column): Column = c(L2NormF(e(a)))
  def lshBuckets(vec: Column, tables: Int, bits: Int): Column =
    c(LshBuckets(e(vec), tables, bits))
  def nearestCentroid(vec: Column, centroids: Seq[Array[Float]]): Column =
    c(NearestCentroid(e(vec), centroids))
  def nearestCentroids(vec: Column, centroids: Seq[Array[Float]], p: Int): Column =
    c(NearestCentroids(e(vec), centroids, p))
  def nearestCentroidSq(vec: Column, centroids: Seq[Array[Double]]): Column =
    c(NearestCentroidSq(e(vec), centroids))
  def nearestCentroidSqD(vec: Column, centroids: Seq[Array[Double]]): Column =
    c(NearestCentroidSqD(e(vec), centroids))
}
