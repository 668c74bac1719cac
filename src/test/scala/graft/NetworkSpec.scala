package graft

import org.apache.spark.sql.functions._

import graft.functions.IpOps

/** network condition + add_network_direction (conditions/network.go,
  * actions/add_network_direction.go). */
class NetworkSpec extends SparkSpec {
  import spark.implicits._

  private def p(s: String): Array[Byte] = IpOps.parse(s)

  test("IPv4 parse: strict dotted quad") {
    assert(p("1.2.3.4") != null)
    assert(p("255.255.255.255") != null)
    assert(p("0.0.0.0") != null)
    assert(p("256.1.1.1") == null)
    assert(p("1.2.3") == null)
    assert(p("1.2.3.4.5") == null)
    assert(p("01.2.3.4") == null) // leading zero
    assert(p("1.2.3.") == null)
    assert(p("a.b.c.d") == null)
    assert(p("") == null)
  }

  test("IPv6 parse: groups, ::, v4 tail") {
    assert(p("::1") != null)
    assert(p("::") != null)
    assert(p("fe80::1") != null)
    assert(p("2001:db8:0:0:0:0:2:1") != null)
    assert(p("::ffff:192.168.1.1") != null)
    assert(p("fd00::abcd") != null)
    assert(p("1:2:3:4:5:6:7:8:9") == null)  // too many groups
    assert(p("1.2.3.4::1") == null)          // v4 quad only legal at the END
    assert(p("1::2::3") == null)            // two ::
    assert(p("12345::") == null)            // group too long
    assert(p("1:2:3:4:5:6:7") == null)      // too few without ::
  }

  test("named networks match the reference's predicate set") {
    assert(IpOps.isPrivate(p("10.1.2.3")))
    assert(IpOps.isPrivate(p("172.16.0.1")) && IpOps.isPrivate(p("172.31.9.9")))
    assert(!IpOps.isPrivate(p("172.32.0.1")))
    assert(IpOps.isPrivate(p("192.168.99.1")))
    assert(IpOps.isPrivate(p("fd12::1")))
    assert(!IpOps.isPrivate(p("8.8.8.8")))
    assert(IpOps.isLoopback(p("127.0.0.1")) && IpOps.isLoopback(p("::1")))
    assert(IpOps.isMulticast(p("224.0.0.1")) && IpOps.isMulticast(p("ff02::1")))
    assert(IpOps.isLinkLocalUnicast(p("169.254.1.1")) && IpOps.isLinkLocalUnicast(p("fe80::2")))
    assert(IpOps.isUnspecified(p("0.0.0.0")) && IpOps.isUnspecified(p("::")))
    assert(IpOps.isGlobalUnicast(p("8.8.8.8")))
    assert(!IpOps.isGlobalUnicast(p("255.255.255.255")))
    // public = !(private || loopback || linklocal || unspecified || bcast)
    assert(!IpOps.isLocalOrPrivate(p("8.8.8.8")))
    assert(IpOps.isLocalOrPrivate(p("10.0.0.1")))
    assert(IpOps.isLocalOrPrivate(p("127.0.0.1")))
  }

  test("CIDR matching: v4 and v6 prefixes, v4 nets never match v6 addrs") {
    val m = IpOps.compileMatchers(Seq("192.0.2.0/24"))
    assert(IpOps.anyContains(m, p("192.0.2.77")))
    assert(!IpOps.anyContains(m, p("192.0.3.1")))
    val m6 = IpOps.compileMatchers(Seq("2001:db8::/32"))
    assert(IpOps.anyContains(m6, p("2001:db8:1::1")))
    assert(!IpOps.anyContains(m6, p("2001:db9::1")))
    // v4-mapped hex form IS v4 to Go's net.IP (To4() succeeds) → matches
    assert(IpOps.anyContains(m, p("::ffff:c000:0201")))
    assert(!IpOps.anyContains(m6, p("10.0.0.1"))) // v4 addr never matches v6 net
    intercept[IllegalArgumentException] { IpOps.compileMatchers(Seq("10.0.0.0/33")) }
    intercept[IllegalArgumentException] { IpOps.compileMatchers(Seq("nonsense")) }
  }

  test("ip_in_networks column + Network condition leaf") {
    val df = Seq("10.0.0.1", "8.8.8.8", "fd00::1", "garbage", "169.254.0.9")
      .toDF("ip")
    val got = df.select(col("ip"),
      graft.functions.ip_in_networks(col("ip"), Seq("private")).as("priv"))
      .as[(String, Boolean)].collect().toMap
    assert(got("10.0.0.1") && got("fd00::1"))
    assert(!got("8.8.8.8") && !got("garbage") && !got("169.254.0.9"))

    val cond = graft.route.Network(Map("ip" -> Seq("private", "loopback")))
    val kept = df.filter(cond.toColumn).as[String].collect().toSet
    assert(kept == Set("10.0.0.1", "fd00::1"))
  }

  test("network_direction classifies all four quadrants; null on bad ip") {
    val df = Seq(
      ("10.0.0.1", "192.168.1.1"),  // internal
      ("10.0.0.1", "8.8.8.8"),      // outbound
      ("8.8.8.8", "10.0.0.1"),      // inbound
      ("8.8.8.8", "1.1.1.1"),       // external
      ("bad", "10.0.0.1")           // null
    ).toDF("src", "dst")
    val got = df.select(graft.functions.network_direction(
      col("src"), col("dst"), Seq("private")).as("d"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
    assert(got == Seq("internal", "outbound", "inbound", "external", null))
  }

  test("community_id matches the reference's golden vectors") {
    import graft.functions.community_id
    // (src, dst, sport/type, dport/code, proto) → expected
    // vectors from communityid/communityid_test.go:56-125
    val cases = Seq(
      (("128.232.110.120", "66.35.250.204", 34855, 80, 6),
        "1:LQU9qZlK+B5F3KDmev6m5PMibrg="),   // canonical TCP vector
      (("66.35.250.204", "128.232.110.120", 80, 34855, 6),
        "1:LQU9qZlK+B5F3KDmev6m5PMibrg="),   // direction-invariant
      (("128.232.110.120", "66.35.250.204", 3, 3, 1),
        "1:KF3iG9XD24nhlSy4r1TcYIr5mfE="),   // ICMP type=3 code=3
      (("128.232.110.120", "66.35.250.204", 0, 0, 2),
        "1:D3t8Q1aFA6Ev0A/AO4i9PnU3AeI=")    // IGMP: no ports hashed
    )
    val df = cases.map(_._1).toDF("s", "d", "sp", "dp", "p")
      .select(community_id(col("s"), col("d"), col("sp"), col("dp"), col("p")).as("cid"))
    assert(df.as[String].collect().toSeq == cases.map(_._2))
    // seed variant (communityid_test.go:60)
    val seeded = Seq(("128.232.110.120", "66.35.250.204", 34855, 80, 6))
      .toDF("s", "d", "sp", "dp", "p")
      .select(community_id(col("s"), col("d"), col("sp"), col("dp"), col("p"),
        seed = 123).as("cid")).as[String].head()
    assert(seeded == "1:hTSGlFQnR58UCk+NfKRZzA32dPg=")
    // bad address → null
    val bad = Seq(("nope", "66.35.250.204", 1, 2, 6)).toDF("s", "d", "sp", "dp", "p")
      .select(community_id(col("s"), col("d"), col("sp"), col("dp"), col("p")).as("cid"))
      .collect()(0)
    assert(bad.isNullAt(0))
  }

  test("dissect |ip type uses the same validator") {
    import graft.functions.dissect
    val r = Seq("src=10.1.2.3 dst=999.9.9.9")
      .toDF("t")
      .select(dissect(col("t"), "src=%{s|ip} dst=%{d|ip}").as("p"))
      .select("p.*").collect()(0)
    assert(r.getString(0) == "10.1.2.3")
    assert(r.isNullAt(1))
  }
}
