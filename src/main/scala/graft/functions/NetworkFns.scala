package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Network address functions mirroring the reference's inet/cidr/macaddr
  * surface (/root/reference/src/backend/utils/adt/gtype_network.c, operators
  * gtype_ops.c:756-827, SQL catalog sql/postgraph-network.sql.in).
  *
  * Representation: inet/cidr = struct(addr LONG, masklen INT) over IPv4
  * (IPv6 is deferred — the reference's v6 paths need 128-bit ints, which
  * would force a binary encoding; document as v2). macaddr = LONG (48-bit),
  * macaddr8 = LONG (64-bit).
  *
  * Everything is Spark built-in column arithmetic (whole-stage codegen, no
  * UDFs): masks/prefixes via exact power-of-two math instead of shifts so
  * shift-amount columns are never needed.
  */
object NetworkFns {

  private val Width = 32

  /** 2^k for k in [0, 32] — exact in double, cast back to long. */
  private def pow2(k: Column): Column = pow(lit(2.0), k.cast("double")).cast("long")

  /** Parse '10.1.2.3' or '10.1.2.0/24' → struct(addr, masklen). */
  def toInet(s: Column): Column = {
    val parts = split(s, "/")
    val ip = element_at(parts, 1)
    val mlen = when(size(parts) > 1, element_at(parts, 2).cast("int"))
      .otherwise(lit(Width))
    val o = transform(split(ip, "\\."), x => x.cast("long"))
    val addr = element_at(o, 1) * 16777216L + element_at(o, 2) * 65536L +
      element_at(o, 3) * 256L + element_at(o, 4)
    struct(addr.as("addr"), mlen.as("masklen"))
  }

  def inet(addr: Column, masklen: Column): Column =
    struct(addr.cast("long").as("addr"), masklen.cast("int").as("masklen"))

  def family(i: Column): Column = lit(4) // IPv4-only representation
  def masklen(i: Column): Column = i.getField("masklen")

  /** Host-part size of the network: 2^(32 - masklen). */
  private def hostSize(i: Column): Column = pow2(lit(Width) - masklen(i))

  /** Network base address (addr with host bits cleared). */
  private def netAddr(i: Column): Column =
    i.getField("addr") - pmod(i.getField("addr"), hostSize(i))

  private def quad(addr: Column): Column = concat_ws(".",
    (addr / 16777216L).cast("long") % 256L, (addr / 65536L).cast("long") % 256L,
    (addr / 256L).cast("long") % 256L, addr % 256L)

  /** host(inet) — the bare address text. */
  def host(i: Column): Column = quad(i.getField("addr"))

  /** text/abbrev rendering: address plus /len when not a full-width mask. */
  def abbrev(i: Column): Column =
    when(masklen(i) === Width, quad(i.getField("addr")))
      .otherwise(concat(quad(i.getField("addr")), lit("/"), masklen(i)))

  /** network(inet) → cidr of the containing network. */
  def network(i: Column): Column =
    struct(netAddr(i).as("addr"), masklen(i).as("masklen"))

  def netmask(i: Column): Column = quad(lit(4294967295L) - (hostSize(i) - 1L))
  def hostmask(i: Column): Column = quad(hostSize(i) - 1L)
  def broadcastAddr(i: Column): Column = quad(netAddr(i) + hostSize(i) - 1L)

  def setMasklen(i: Column, len: Column): Column =
    struct(i.getField("addr").as("addr"), len.cast("int").as("masklen"))

  def inetSameFamily(a: Column, b: Column): Column =
    family(a) === family(b)

  /** Number of leading bits shared by two addresses. */
  private def commonPrefixLen(a: Column, b: Column): Column = {
    val x = a.bitwiseXOR(b)
    val bits = when(x === 0L, lit(0))
      .otherwise((floor(log(2.0, x.cast("double"))) + 1).cast("int"))
    lit(Width) - bits
  }

  /** inet_merge: smallest network containing both. */
  def inetMerge(a: Column, b: Column): Column = {
    val len = least(masklen(a), masklen(b),
      commonPrefixLen(a.getField("addr"), b.getField("addr")))
    network(setMasklen(a, len))
  }

  /** `a <<= b` — a is contained in or equals network b. */
  def containedInOrEq(a: Column, b: Column): Column =
    masklen(b) <= masklen(a) && netAddr(setMasklen(a, masklen(b))) === netAddr(b)
  /** `a << b` — strict containment. */
  def containedIn(a: Column, b: Column): Column =
    masklen(b) < masklen(a) && netAddr(setMasklen(a, masklen(b))) === netAddr(b)
  def containsOrEq(a: Column, b: Column): Column = containedInOrEq(b, a)
  def containsNet(a: Column, b: Column): Column = containedIn(b, a)
  /** `a && b` — networks overlap (either contains the other). */
  def inetOverlap(a: Column, b: Column): Column =
    containedInOrEq(a, b) || containedInOrEq(b, a)

  // ------------------------------------------------------------------ macaddr

  /** Parse 'aa:bb:cc:dd:ee:ff' (also -/. separators) → 48-bit long. */
  def toMacaddr(s: Column): Column =
    conv(regexp_replace(lower(s), "[:.\\-]", ""), 16, 10).cast("long")

  /** Render 48-bit long → 'aa:bb:cc:dd:ee:ff'. */
  def macaddrText(m: Column): Column = {
    val h = lpad(lower(hex(m)), 12, "0")
    concat_ws(":", substring(h, 1, 2), substring(h, 3, 2), substring(h, 5, 2),
      substring(h, 7, 2), substring(h, 9, 2), substring(h, 11, 2))
  }

  /** trunc(macaddr) — zero the NIC-specific last 3 bytes (vendor prefix). */
  def macaddrTrunc(m: Column): Column = m - pmod(m, lit(16777216L))

  /** macaddr8_set7bit — set the locally-administered bit (0x02 of octet 1)
    * of an 8-byte EUI-64 address. */
  def macaddr8Set7bit(m: Column): Column = m.bitwiseOR(lit(0x0200000000000000L))
}
