package graft.ext

import scala.io.Source

/** The real public-suffix list (ICANN section), bundled as a resource
  * and evaluated with the published PSL algorithm
  * (https://publicsuffix.org/list/ — "Formal algorithm"): among all
  * rules matching a host, an exception rule prevails; otherwise the
  * rule with the most labels; a rule `*.B` matches any single extra
  * label left of `B`; with no match the public suffix is the last
  * label (the implicit `*` default rule). The registrable domain
  * (eTLD+1) is the public suffix plus one more label.
  *
  * Round-16 (verdict task #5): replaces the 6-entry demo subset that
  * stood in for the list since round 14. The data file is
  * `graft/public_suffix_list_icann.dat` — the ICANN DOMAINS section of
  * the Mozilla Public Suffix List, verbatim, from the OS's
  * `publicsuffix` package (public data, MPL-2.0; attribution kept in
  * the file header). 7,380 rules: exact ≤ 4 labels, wildcards `*.B`
  * with base ≤ 2 labels, 8 exceptions.
  *
  * Scale shape: the rule sets live in THREE immutable hash sets built
  * once per JVM (classloader-lazy — every executor pays the ~170 KB
  * parse exactly once, the "tiny broadcast" shape without an actual
  * broadcast variable), and evaluation is O(labels) hash probes per
  * row — a narrow map, no shuffle, usable inside whole-stage codegen
  * via [[org.apache.spark.sql.graft.PslEtld1]].
  *
  * Conventions at the boundary (shared with the oracle SQL and
  * UrlSpec):
  *  - a host that IS a public suffix (e.g. `co.uk`, or `zzz.ck` under
  *    `*.ck`) has no registrable domain — etld1 returns the host;
  *  - exception rule `!E`: public suffix is E minus its leftmost
  *    label, so etld1(www.ck) = www.ck and etld1(a.www.ck) = www.ck;
  *  - lookups assume the caller already lowercased the host
  *    ([[Url.host]] does).
  */
object Psl {

  /** (exact rules, wildcard bases, exception rules) — parsed once. */
  private lazy val (exact, wildBase, exception):
      (Set[String], Set[String], Set[String]) = {
    val in = getClass.getClassLoader
      .getResourceAsStream("graft/public_suffix_list_icann.dat")
    require(in != null, "graft/public_suffix_list_icann.dat not on classpath")
    val ex = Set.newBuilder[String]
    val wb = Set.newBuilder[String]
    val xc = Set.newBuilder[String]
    val src = Source.fromInputStream(in, "UTF-8")
    try src.getLines().foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("//")) {
        if (line.startsWith("!")) xc += line.substring(1)
        else if (line.startsWith("*.")) wb += line.substring(2)
        else ex += line
      }
    } finally src.close()
    (ex.result(), wb.result(), xc.result())
  }

  /** Longest label-count any probe needs: exact rules reach 4 labels,
    * exceptions 3, wildcard bases 2 (so wildcard matches reach 3).
    */
  val MaxLabels: Int = 4

  /** The parsed rule sets, exposed so the x133 oracle can inject the
    * SAME list as a literal table (and specs can sanity-probe it).
    */
  def exactRules: Set[String] = exact
  def wildcardBases: Set[String] = wildBase
  def exceptionRules: Set[String] = exception

  /** Public-suffix label count for a lowercased host split into
    * labels. Never more than `labels.length` (a host equal to a
    * public suffix gets psLen = n).
    */
  private def publicSuffixLen(labels: Array[String]): Int = {
    val n = labels.length
    // right-aligned candidate suffixes, built once: suffix(1)..suffix(maxL)
    val maxL = math.min(n, MaxLabels)
    val suffix = new Array[String](maxL + 1)
    var l = 1
    while (l <= maxL) {
      suffix(l) =
        if (l == 1) labels(n - 1) else labels(n - l) + "." + suffix(l - 1)
      l += 1
    }
    // exception prevails over everything
    l = maxL
    while (l >= 1) {
      if (exception.contains(suffix(l))) return l - 1
      l -= 1
    }
    // otherwise the most-labels match; wildcard *.B (base b labels)
    // matches with psLen b+1 only when a label actually sits left of B
    var best = 1 // implicit default rule `*`
    l = 1
    while (l <= maxL) {
      if (exact.contains(suffix(l)) && l > best) best = l
      if (l < n && wildBase.contains(suffix(l)) && l + 1 > best) best = l + 1
      l += 1
    }
    best
  }

  /** Registrable domain of a lowercased host, or the host itself when
    * it is (or sits inside) a bare public suffix. Called per row from
    * the native expression — allocation is one split plus the joined
    * result.
    */
  def etld1(host: String): String = {
    if (host.isEmpty) return host
    val labels = host.split('.')
    val n = labels.length
    if (n <= 1) return host
    val ps = publicSuffixLen(labels)
    if (n <= ps) host
    else labels.slice(n - ps - 1, n).mkString(".")
  }
}
