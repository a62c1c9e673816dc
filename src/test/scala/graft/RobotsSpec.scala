package graft

import graft.functions.RobotsOps
import org.apache.spark.unsafe.types.UTF8String

/** RFC 9309 robots.txt evaluation — precedence, wildcards, grouping,
  * and the lenient-parse posture, pinned by spec-derived cases. */
class RobotsSpec extends SparkSpec {

  private def ok(robots: String, path: String, agent: String = "graftbot"): Boolean =
    RobotsOps.allowed(UTF8String.fromString(robots),
      UTF8String.fromString(agent), UTF8String.fromString(path))

  test("precedence: longest match wins; Allow wins ties; default allow") {
    val r = "User-agent: *\nDisallow: /private\nAllow: /private/ok\n"
    assert(!ok(r, "/private/x"))
    assert(ok(r, "/private/ok/y"), "longer Allow beats shorter Disallow")
    assert(ok(r, "/public"), "unmatched path defaults to allow")
    assert(ok("", "/anything"), "empty robots allows everything")
    // exact tie: Allow wins
    val tie = "User-agent: *\nDisallow: /page\nAllow: /page\n"
    assert(ok(tie, "/page/x"))
  }

  test("wildcards and end anchors") {
    val r = "User-agent: *\nDisallow: /*.php\n"
    assert(!ok(r, "/index.php"))
    assert(!ok(r, "/a/b/file.php?q=1"), "prefix semantics: .php anywhere then more")
    assert(ok(r, "/index.html"))
    val anchored = "User-agent: *\nDisallow: /*.php$\n"
    assert(!ok(anchored, "/index.php"))
    assert(ok(anchored, "/index.php?q=1"), "$ anchors to the very end")
    val mid = "User-agent: *\nDisallow: /fish*tank\n"
    assert(!ok(mid, "/fishbigtank/x") && !ok(mid, "/fishtank"))
    assert(ok(mid, "/fish"))
  }

  test("grouping: specific agent overrides *; consecutive UA lines share rules; groups merge") {
    val r = "User-agent: googlebot\nDisallow: /g\n\n" +
      "User-agent: *\nDisallow: /\n"
    assert(!ok(r, "/anything"), "unnamed agent falls to *")
    assert(ok(r, "/anything", agent = "googlebot"), "specific group replaces *")
    assert(!ok(r, "/g/x", agent = "googlebot"))
    // consecutive UA lines: both agents get the rules
    val multi = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
    assert(!ok(multi, "/x/1", agent = "a") && !ok(multi, "/x/1", agent = "b"))
    // two groups naming the same agent MERGE
    val merged = "User-agent: a\nDisallow: /one\n\nUser-agent: a\nDisallow: /two\n"
    assert(!ok(merged, "/one/x", agent = "a") && !ok(merged, "/two/y", agent = "a"))
    // RFC 9309: consecutive UA lines COMBINE even across blank lines —
    // "User-agent: a" directly followed by "User-agent: *" is ONE group,
    // so a shares the deny (the pre-RFC blank-line-separator reading
    // would wrongly shield it)
    val combined = "User-agent: a\n\nUser-agent: *\nDisallow: /\n"
    assert(!ok(combined, "/x", agent = "a"))
    // a genuinely rule-less specific group (concluded by EOF) still
    // shields from *
    val shield = "User-agent: *\nDisallow: /\n\nUser-agent: a\n"
    assert(ok(shield, "/x", agent = "a"))
  }

  test("lenient parse: comments, CRLF, case-insensitive fields, junk lines, empty values") {
    val r = "# top comment\r\nUSER-AGENT: *  # trailing\r\n" +
      "disallow: /a\r\nCrawl-delay: 10\r\nSitemap: http://x/s.xml\r\n" +
      "not a field at all\r\nDisallow:\r\n"
    assert(!ok(r, "/a/b"), "rules survive comments/CRLF/case/junk")
    assert(ok(r, "/b"), "empty Disallow restricts nothing")
  }

  test("registered function: robots_allowed reaches expr strings") {
    graft.Tables.registerViews(spark, sf)
    val got = graft.compile.Compiler.compileJson(spark, """
      {"source": {"sql": "SELECT * FROM VALUES (1, '/private/x'), (2, '/pub') AS t(id, path)"},
       "derive": {"ok": "robots_allowed('User-agent: *\nDisallow: /private', 'bot', path)"},
       "keep_columns": ["id", "ok"],
       "order_by": ["id asc"]}""")
      .collect().map(r => r.getInt(0) -> r.getBoolean(1)).toMap
    assert(got == Map(1 -> false, 2 -> true))
  }
}
