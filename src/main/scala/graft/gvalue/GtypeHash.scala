package graft.gvalue

import java.nio.charset.StandardCharsets.UTF_8

/** Bit-exact reimplementation of the reference's `gtype_hash_cmp`
  * (gtype.c:1965-2000): a walk over the gtype iterator token stream that
  * mixes per-scalar 64-bit hashes (PG's extended hash family) under a
  * rotating seed, truncated to int32 at the SQL surface.
  *
  * The scalar hashes are PostgreSQL's public `hash_bytes_extended` /
  * `hash_uint32_extended` (Bob Jenkins' lookup3 as shipped in PG
  * src/common/hashfn.c, little-endian path), `hashint8extended`,
  * `hashfloat8extended`, `hashcharextended` (hashfunc.c) and
  * `hash_numeric_extended` (numeric.c: base-10000 digit array, weight
  * XOR'd into the result).
  *
  * Walk protocol (gtype_hash_cmp + gtype_hash_scalar_value_extended,
  * gtype_util.c:1480-1531):
  *  - seed starts at 0xF0F0F0F0; EVERY token left-rotates it by 1
  *  - BEGIN_ARRAY (non-raw-scalar) rotates left 4; END_ARRAY right 4
  *  - BEGIN_OBJECT rotates left 6; END_OBJECT right 4 (asymmetric — as
  *    shipped)
  *  - each scalar token (KEY/VALUE/ELEM): hash = rotHalves(hash) ^ tmp
  *    where tmp is the scalar's seeded hash; null hashes to seed+1, bools
  *    to 2/4 when the seed is zero
  *  - a top-level scalar sits in a raw-scalar array wrapper whose
  *    BEGIN/END rotate only the per-token 1
  * Object pairs iterate in jsonb key order (length, then bytes).
  */
object GtypeHash {

  // ---- PG lookup3 (src/common/hashfn.c), 32-bit lanes ------------------

  @inline private def rot32(x: Int, k: Int): Int = Integer.rotateLeft(x, k)

  /** lookup3 mix: scrambles three 32-bit lanes. */
  private def mix(a0: Int, b0: Int, c0: Int): (Int, Int, Int) = {
    var a = a0; var b = b0; var c = c0
    a -= c; a ^= rot32(c, 4); c += b
    b -= a; b ^= rot32(a, 6); a += c
    c -= b; c ^= rot32(b, 8); b += a
    a -= c; a ^= rot32(c, 16); c += b
    b -= a; b ^= rot32(a, 19); a += c
    c -= b; c ^= rot32(b, 4); b += a
    (a, b, c)
  }

  /** lookup3 final: last mix of the three lanes. */
  private def fin(a0: Int, b0: Int, c0: Int): (Int, Int, Int) = {
    var a = a0; var b = b0; var c = c0
    c ^= b; c -= rot32(b, 14)
    a ^= c; a -= rot32(c, 11)
    b ^= a; b -= rot32(a, 25)
    c ^= b; c -= rot32(b, 16)
    a ^= c; a -= rot32(c, 4)
    b ^= a; b -= rot32(a, 14)
    c ^= b; c -= rot32(b, 24)
    (a, b, c)
  }

  /** hash_bytes_extended: little-endian word loads + 11-byte tail. */
  def hashBytesExtended(k: Array[Byte], seed: Long): Long = {
    var len = k.length
    val init = 0x9e3779b9 + k.length + 3923095
    var a = init; var b = init; var c = init
    if (seed != 0) {
      a += (seed >>> 32).toInt
      b += seed.toInt
      val m = mix(a, b, c); a = m._1; b = m._2; c = m._3
    }
    var off = 0
    @inline def w32(i: Int): Int =
      (k(i) & 0xff) | ((k(i + 1) & 0xff) << 8) |
        ((k(i + 2) & 0xff) << 16) | ((k(i + 3) & 0xff) << 24)
    while (len >= 12) {
      a += w32(off); b += w32(off + 4); c += w32(off + 8)
      val m = mix(a, b, c); a = m._1; b = m._2; c = m._3
      off += 12; len -= 12
    }
    // tail switch, little-endian (fallthrough semantics preserved)
    if (len >= 11) c += (k(off + 10) & 0xff) << 24
    if (len >= 10) c += (k(off + 9) & 0xff) << 16
    if (len >= 9) c += (k(off + 8) & 0xff) << 8
    if (len >= 8) { b += w32(off + 4); a += w32(off) }
    else {
      if (len == 7) b += (k(off + 6) & 0xff) << 16
      if (len >= 6) b += (k(off + 5) & 0xff) << 8
      if (len >= 5) b += k(off + 4) & 0xff
      if (len >= 4) a += w32(off)
      else {
        if (len == 3) a += (k(off + 2) & 0xff) << 16
        if (len >= 2) a += (k(off + 1) & 0xff) << 8
        if (len >= 1) a += k(off) & 0xff
      }
    }
    val f = fin(a, b, c)
    ((f._2.toLong & 0xffffffffL) << 32) | (f._3.toLong & 0xffffffffL)
  }

  /** hash_uint32_extended. */
  def hashUint32Extended(kv: Int, seed: Long): Long = {
    val init = 0x9e3779b9 + 4 + 3923095
    var a = init; var b = init; var c = init
    if (seed != 0) {
      a += (seed >>> 32).toInt
      b += seed.toInt
      val m = mix(a, b, c); a = m._1; b = m._2; c = m._3
    }
    a += kv
    val f = fin(a, b, c)
    ((f._2.toLong & 0xffffffffL) << 32) | (f._3.toLong & 0xffffffffL)
  }

  /** hashint8extended: fold halves (sign-aware), then uint32 hash. */
  def hashInt8Extended(v: Long, seed: Long): Long = {
    val lo = v.toInt
    val hi = (v >>> 32).toInt
    hashUint32Extended(lo ^ (if (v >= 0) hi else ~hi), seed)
  }

  /** hashfloat8extended: ±0 hash to the seed; else the raw LE bytes. */
  def hashFloat8Extended(v: Double, seed: Long): Long = {
    if (v == 0.0) return seed
    val bits = java.lang.Double.doubleToLongBits(v)
    val bytes = Array.tabulate[Byte](8)(i => ((bits >>> (8 * i)) & 0xff).toByte)
    hashBytesExtended(bytes, seed)
  }

  /** hash_numeric_extended: base-10000 digits (leading/trailing zero
    * groups stripped by the loop), each digit 2 LE bytes, weight XOR'd
    * (sign-extended) into the digit hash. Zero hashes to seed-1.
    */
  def hashNumericExtended(n: BigDecimal, seed: Long): Long = {
    val bd = n.bigDecimal
    if (bd.signum() == 0) return seed - 1
    // decompose |n| into base-10000 digits aligned to the decimal point
    val abs = bd.abs.stripTrailingZeros
    val plain = abs.toPlainString
    val (ip0, fp0) = plain.indexOf('.') match {
      case -1 => (plain, "")
      case i  => (plain.substring(0, i), plain.substring(i + 1))
    }
    val ip = if (ip0.isEmpty || ip0 == "0") "" else ip0.dropWhile(_ == '0')
    val ipPad = "0" * ((4 - ip.length % 4) % 4) + ip
    val fpPad = fp0 + "0" * ((4 - fp0.length % 4) % 4)
    val groups = (ipPad + fpPad).grouped(4).map(_.toInt).toArray
    var weight = ipPad.length / 4 - 1 // base-10000 weight of groups(0)
    // NOTE: the reference hashes the DIGITS only — the sign does not
    // participate (numeric.c hash_numeric_extended ignores NUMERIC_SIGN)
    var start = 0
    while (start < groups.length && groups(start) == 0) { start += 1; weight -= 1 }
    if (start == groups.length) return seed - 1
    var end = groups.length - 1
    while (end >= 0 && groups(end) == 0) end -= 1
    val digits = groups.slice(start, end + 1)
    val bytes = new Array[Byte](digits.length * 2) // NumericDigit = int16 LE
    digits.zipWithIndex.foreach { case (d, i) =>
      bytes(2 * i) = (d & 0xff).toByte
      bytes(2 * i + 1) = ((d >> 8) & 0xff).toByte
    }
    hashBytesExtended(bytes, seed) ^ weight.toLong // int→uint64 sign-extends
  }

  // ---- the gtype walk ---------------------------------------------------

  @inline private def rotL(n: Long, i: Int): Long = java.lang.Long.rotateLeft(n, i)
  @inline private def rotR(n: Long, i: Int): Long = java.lang.Long.rotateRight(n, i)

  /** ROTATE_HIGH_AND_LOW_32BITS (gtype_util.c:1529): rotate each 32-bit
    * half left by 1 WITHIN its own half — verified against the goldens
    * (`[null, null]` → 3, `[null]×4` → 15).
    */
  @inline private def rotHalves(h: Long): Long =
    ((h << 1) & 0xfffffffefffffffeL) | ((h >>> 31) & 0x0000000100000001L)

  /** jsonb object pair order: shorter key first, then byte order. */
  private def keyOrder(a: String, b: String): Boolean = {
    val ab = a.getBytes(UTF_8); val bb = b.getBytes(UTF_8)
    if (ab.length != bb.length) ab.length < bb.length
    else {
      val c = java.util.Arrays.compareUnsigned(ab, bb)
      c < 0
    }
  }

  /** int32 result of the reference's gtype_hash_cmp over one gtype value
    * (the SQL surface reads the low 32 bits of the running uint64).
    */
  def hashCmp(v: GValue): Int = {
    var hash = 0L
    var seed = 0xF0F0F0F0L
    def tick(): Unit = seed = rotL(seed, 1) // every token rotates by 1
    def scalar(s: GValue): Unit = {
      val tmp = s match {
        case GNull       => seed + 1
        case GString(x)  => hashBytesExtended(x.getBytes(UTF_8), seed)
        case GNumeric(n) => hashNumericExtended(n, seed)
        case GBool(b) =>
          if (seed != 0) hashUint32Extended(if (b) 1 else 0, seed)
          else if (b) 2L else 4L
        case GInt(i)   => hashInt8Extended(i, seed)
        case GFloat(f) => hashFloat8Extended(f, seed)
        case other => throw new IllegalArgumentException(
          s"invalid gtype scalar to hash: ${other.getClass.getSimpleName}")
      }
      hash = rotHalves(hash) ^ tmp
      tick()
    }
    def walk(x: GValue): Unit = x match {
      case GArray(es) =>
        seed = rotL(seed, 4); tick() // WGT_BEGIN_ARRAY
        es.foreach {
          case c @ (GArray(_) | GMap(_)) => walk(c)
          case s                         => scalar(s) // WGT_ELEM
        }
        seed = rotR(seed, 4); tick() // WGT_END_ARRAY
      case GMap(es) =>
        seed = rotL(seed, 6); tick() // WGT_BEGIN_OBJECT
        es.toSeq.sortWith((a, b) => keyOrder(a._1, b._1)).foreach { case (k, pv) =>
          scalar(GString(k)) // WGT_KEY
          pv match {
            case c @ (GArray(_) | GMap(_)) => walk(c)
            case s                         => scalar(s) // WGT_VALUE
          }
        }
        seed = rotR(seed, 4); tick() // WGT_END_OBJECT (right 4 — as shipped)
      case s => // raw-scalar wrapper: BEGIN/END rotate only the per-token 1
        tick() // WGT_BEGIN_ARRAY (raw_scalar)
        scalar(s) // WGT_ELEM
        tick() // WGT_END_ARRAY (raw_scalar)
    }
    walk(v)
    hash.toInt
  }
}
