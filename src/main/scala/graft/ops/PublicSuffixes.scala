package graft.ops

/** Public-Suffix-List rule table for registered-domain keying
  * (publicsuffix.org/list semantics; the reference list itself is public
  * data). Three rule kinds, stated in the list's own syntax:
  *   - normal (`co.uk`): the suffix's labels are public;
  *   - wildcard (`*.ck`): any ONE label under the parent is public;
  *   - exception (`!www.ck`): overrides a wildcard — the named suffix is
  *     NOT public (so it is itself a registrable domain).
  * Matching: a rule matches a host when the rule's labels are a suffix of
  * the host's labels; any matching exception prevails, else the LONGEST
  * matching rule, else the implicit `*` rule (the bare TLD is public).
  * Registered domain = public suffix + one more label.
  *
  * [[Full]] (the default everywhere) loads the vendored
  * `graft/public_suffix_list.dat` resource — list format, ICANN +
  * PRIVATE sections; a deployment drops the live publicsuffix.org file
  * at that path for byte-exact parity (zero-egress build ships a
  * comprehensive offline snapshot). [[Default]] is the older curated
  * subset, kept as the fallback when the resource is trimmed from a jar.
  * Either way the lookup is O(host labels) hash probes regardless of
  * rule count, so the full list costs the same per row.
  */
object PublicSuffixes {

  /** Parse publicsuffix.org list-format text into rules: strip `//`
    * comments, section markers, blanks, and surrounding whitespace;
    * lowercase (the list is defined case-insensitive). Rule syntax
    * (`*.` wildcard, `!` exception) passes through verbatim.
    */
  def parse(lines: Iterator[String]): Seq[String] =
    lines.map(_.trim.toLowerCase)
      .filter(l => l.nonEmpty && !l.startsWith("//"))
      .toVector

  /** The vendored full rule table (`graft/public_suffix_list.dat` on the
    * classpath — publicsuffix.org list format, ICANN + PRIVATE sections).
    * Deployments refresh the file in place for byte-exact live-list
    * semantics; the loader and matcher are format-complete, so the swap
    * is a resource drop, not a code change. Falls back to [[Default]]
    * if the resource is absent (trimmed deployment jars).
    */
  lazy val Full: Seq[String] = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_list.dat")
    if (in == null) Default
    else try parse(scala.io.Source.fromInputStream(in, "UTF-8").getLines())
    finally in.close()
  }

  /** Curated PSL subset (list syntax, lowercase; punycode for IDN rules). */
  val Default: Seq[String] = Seq(
    // United Kingdom
    "co.uk", "org.uk", "net.uk", "ac.uk", "gov.uk", "sch.uk", "nhs.uk",
    "police.uk", "ltd.uk", "plc.uk", "me.uk",
    // Japan (incl. the canonical wildcard/exception city family)
    "co.jp", "or.jp", "ne.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp",
    "gr.jp", "lg.jp", "*.kobe.jp", "!city.kobe.jp",
    "*.kawasaki.jp", "!city.kawasaki.jp",
    // Brazil
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "blog.br", "art.br",
    // France
    "gouv.fr", "asso.fr", "com.fr", "tm.fr", "nom.fr",
    // Australia / New Zealand
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au", "asn.au",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    // Africa / Middle East
    "co.za", "org.za", "net.za", "gov.za", "ac.za", "web.za",
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il",
    "com.eg", "net.eg", "org.eg", "gov.eg", "edu.eg",
    // South / East / Southeast Asia
    "co.in", "net.in", "org.in", "gen.in", "firm.in", "gov.in", "ac.in",
    "edu.in", "res.in", "nic.in",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "co.kr", "or.kr", "ne.kr", "go.kr", "ac.kr", "re.kr", "pe.kr",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg",
    "com.my", "net.my", "org.my", "edu.my", "gov.my",
    "co.id", "or.id", "web.id", "ac.id", "go.id", "sch.id",
    "co.th", "or.th", "ac.th", "go.th", "in.th", "net.th",
    // Americas
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar",
    "com.co", "net.co", "org.co", "gov.co", "edu.co",
    "com.pe", "net.pe", "org.pe", "gob.pe", "edu.pe",
    "com.ve", "net.ve", "org.ve", "gob.ve",
    // Europe (non-flat registries)
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "bel.tr", "web.tr",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "waw.pl",
    "com.gr", "net.gr", "org.gr", "edu.gr", "gov.gr",
    "com.pt", "net.pt", "org.pt", "edu.pt", "gov.pt",
    "com.ro", "org.ro", "tm.ro", "nt.ro",
    // whole-TLD wildcards still on the live list
    "*.ck", "!www.ck", "*.er", "*.fk", "*.bd", "*.kh", "*.mm", "*.np",
    "*.pg",
    // IDN registry suffixes (punycode): 公司.cn / 网络.cn
    "xn--55qx5d.cn", "xn--io0a7i.cn",
    // private-section hosting platforms (each customer a registrant)
    "github.io", "githubusercontent.com", "gitlab.io", "blogspot.com",
    "appspot.com", "herokuapp.com", "netlify.app", "vercel.app",
    "pages.dev", "workers.dev", "web.app", "firebaseapp.com",
    "azurewebsites.net", "cloudapp.azure.com", "s3.amazonaws.com",
    "github.dev", "readthedocs.io", "onrender.com", "fly.dev")

  /** Compiled lookup table: three hash sets + an O(labels) matcher.
    * Serializable — an Expression carries it into tasks with the plan;
    * the sets are built once per deserialization, lookups are hash
    * probes, so rule-file size never touches per-row cost.
    */
  final class Table(rules: Seq[String]) extends Serializable {
    // sets are rebuilt lazily on the executor after deserialization
    @transient private lazy val normal: java.util.HashSet[String] = {
      val s = new java.util.HashSet[String]()
      rules.foreach(r => if (!r.startsWith("*.") && !r.startsWith("!")) s.add(r))
      s
    }
    @transient private lazy val wildcardParent: java.util.HashSet[String] = {
      val s = new java.util.HashSet[String]()
      rules.foreach(r => if (r.startsWith("*.")) s.add(r.substring(2)))
      s
    }
    @transient private lazy val exception: java.util.HashSet[String] = {
      val s = new java.util.HashSet[String]()
      rules.foreach(r => if (r.startsWith("!")) s.add(r.substring(1)))
      s
    }

    /** Registered domain of a (lowercase) host. A host that IS a public
      * suffix (or a single label) passes through unchanged — the
      * pragmatic keying choice: "co.uk" or "localhost" each key their
      * own bucket rather than dropping to null.
      */
    def registrable(host: String): String = {
      if (host == null) return null
      val labels = host.split("\\.", -1)
      val n = labels.length
      if (n <= 1) return host
      // walk suffixes short→long, building each from the previous
      var suffix = labels(n - 1)
      var prev: String = null // suffix one label shorter than `suffix`
      var matchLen = 1 // the implicit `*` rule: every bare TLD is public
      var excLen = 0
      var excSuffix: String = null
      var matchSuffix = suffix
      var i = 1
      while (i <= n) {
        if (i > 1) {
          prev = suffix
          suffix = labels(n - i) + "." + suffix
        }
        if (exception.contains(suffix)) { excLen = i; excSuffix = suffix }
        if (normal.contains(suffix) && i > matchLen) {
          matchLen = i; matchSuffix = suffix
        }
        if (i >= 2 && wildcardParent.contains(prev) && i > matchLen) {
          matchLen = i; matchSuffix = suffix
        }
        i += 1
      }
      if (excLen > 0) excSuffix // exception rule IS the registrable domain
      else if (n > matchLen) {
        // public suffix + one label
        labels(n - matchLen - 1) + "." + matchSuffix
      } else host // host is itself a public suffix
    }
  }
}
