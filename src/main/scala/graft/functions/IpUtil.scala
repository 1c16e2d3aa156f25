package graft.functions

/** Pure-Scala IP literal validation with Go `net.ParseIP` semantics
  * (reference: `/root/reference/parser/fastjson.go:739-785`): dotted-quad
  * IPv4 (no leading zeros, each octet 0-255) or RFC-4291 IPv6 text
  * (including `::` compression and an embedded IPv4 tail). Used by the
  * IPv4/IPv6 tolerant getters; no DNS, no exceptions.
  */
object IpUtil extends Serializable {

  def isValidIp(s: String): Boolean =
    s != null && s.nonEmpty && (isValidIpv4(s) || isValidIpv6(s))

  def isValidIpv4(s: String): Boolean = {
    var i = 0
    var groups = 0
    val n = s.length
    while (groups < 4) {
      if (i >= n) return false
      var v = 0
      var digits = 0
      val start = i
      while (i < n && s.charAt(i) >= '0' && s.charAt(i) <= '9') {
        v = v * 10 + (s.charAt(i) - '0')
        digits += 1
        if (digits > 3 || v > 255) return false
        i += 1
      }
      if (digits == 0) return false
      // Go (since 1.17) rejects leading zeros in dotted-quad components.
      if (digits > 1 && s.charAt(start) == '0') return false
      groups += 1
      if (groups < 4) {
        if (i >= n || s.charAt(i) != '.') return false
        i += 1
      }
    }
    i == n
  }

  def isValidIpv6(s: String): Boolean = {
    if (!s.contains(':')) return false
    var body = s
    // zone index (e.g. fe80::1%eth0) is accepted by Go's ParseIP
    val pct = body.indexOf('%')
    if (pct >= 0) {
      if (pct == body.length - 1) return false
      body = body.substring(0, pct)
    }
    var doubleColon = false
    if (body.startsWith("::")) { doubleColon = true; body = body.substring(2) }
    else if (body.startsWith(":")) return false
    if (body.endsWith("::")) {
      if (doubleColon && body.nonEmpty) return false // ":::" etc
      doubleColon = true
      body = body.substring(0, body.length - 2)
    } else if (body.endsWith(":")) return false

    if (body.isEmpty) return doubleColon // "::"
    val parts = body.split(":", -1)
    var groups = 0
    var sawEmpty = false
    var i = 0
    while (i < parts.length) {
      val p = parts(i)
      if (p.isEmpty) {
        if (sawEmpty || doubleColon) return false // at most one "::"
        sawEmpty = true
      } else if (p.contains('.')) {
        // embedded IPv4 must be the final group and counts as two groups
        if (i != parts.length - 1 || !isValidIpv4(p)) return false
        groups += 2
      } else {
        if (p.length > 4) return false
        var j = 0
        while (j < p.length) {
          val c = p.charAt(j)
          val hex = (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
          if (!hex) return false
          j += 1
        }
        groups += 1
      }
      i += 1
    }
    val compressed = doubleColon || sawEmpty
    if (compressed) groups < 8 else groups == 8
  }
}
