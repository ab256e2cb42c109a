package graft.enrich

/** Rule TABLES for the M2 user-agent and M3 referrer mappers — data,
  * not code, in the shape of the public uap-core `regexes.yaml` and
  * snowplow referer-parser `referers.yml` databases
  * (ref mapper/rakam-mapper-website/.../UserAgentEventMapper.java:63-131
  * bundles ua-parser over uap-core; ReferrerEventMapper.java:46-149
  * bundles referer-parser). Each table folds into ONE vectorized
  * `when`-chain / `coalesce` expression at plan time — first matching
  * rule wins, exactly the uap-core priority convention (spiders first,
  * Chromium shells before Chrome, CriOS/FxiOS before Safari) — so the
  * scan-side plan shape is identical to a hand-rolled chain, while the
  * knowledge lives in rows a maintainer extends without touching the
  * mapper. A broadcast-dim formulation of the same table would probe
  * via a nested-loop regex join; the folded chain does the identical
  * work inside the scan's codegen with no join node at all.
  *
  * Version semantics follow the reference mapper: MAJOR version only
  * (`parsed.userAgent.major` / `parsed.os.major`), and desktop devices
  * report family "Other" (TestUserAgentEventMapper expects Chrome on
  * Mac ⇒ device "Other", os_version "10").
  */
object UaRules {

  /** One browser rule: family, detection regex, version regex whose
    * group 1 is the MAJOR version ("" = no version, e.g. spiders). */
  final case class UaRule(family: String, detect: String, version: String = "")

  /** Spider detection — the families uap-core tags as device "Spider";
    * the reference REJECTS these with 403 (UserAgentEventMapper:87-90),
    * this engine flags them for the caller's side output. */
  val SpiderRe: String = "(?i)(bot|crawl|spider|slurp|archiver|wget|curl|" +
    "python-requests|python-urllib|scrapy|httpclient|okhttp|java/|libwww|" +
    "phantomjs|headlesschrome|facebookexternalhit|bingpreview|pingdom|" +
    "lighthouse|gtmetrix|uptimerobot|petalbot|bytespider|semrush|ahrefs|" +
    "mj12bot|dotbot|ia_archiver)"

  /** Browser families in uap-core priority order. */
  val browsers: Seq[UaRule] = Seq(
    UaRule("Spider", SpiderRe),
    UaRule("Opera Mini", "Opera Mini", "Opera Mini/(\\d+)"),
    UaRule("Opera Mobile", "Opera Mobi", "(?:Opera Mobi.*Version|Opera Mobi)/?(\\d+)?"),
    UaRule("Opera", "OPR/|Opera[ /]", "(?:OPR|Opera|Version)[ /](\\d+)"),
    UaRule("Edge", "Edg(?:e|A|iOS)?/", "Edg(?:e|A|iOS)?/(\\d+)"),
    UaRule("Samsung Internet", "SamsungBrowser/", "SamsungBrowser/(\\d+)"),
    UaRule("Yandex Browser", "YaBrowser/", "YaBrowser/(\\d+)"),
    UaRule("Vivaldi", "Vivaldi/", "Vivaldi/(\\d+)"),
    UaRule("UC Browser", "UCBrowser/", "UCBrowser/(\\d+)"),
    UaRule("Whale", "Whale/", "Whale/(\\d+)"),
    UaRule("MiuiBrowser", "MiuiBrowser/", "MiuiBrowser/(\\d+)"),
    UaRule("QQ Browser", "M?QQBrowser/", "M?QQBrowser/(\\d+)"),
    UaRule("Facebook", "FBAV/|FBAN/", "FBAV/(\\d+)"),
    UaRule("Instagram", "Instagram[ /]", "Instagram[ /](\\d+)"),
    UaRule("WeChat", "MicroMessenger/", "MicroMessenger/(\\d+)"),
    UaRule("Chrome Mobile iOS", "CriOS/", "CriOS/(\\d+)"),
    UaRule("Firefox iOS", "FxiOS/", "FxiOS/(\\d+)"),
    UaRule("Chrome Mobile", "Chrome/\\d[^)]*Mobile|CrMo/", "(?:Chrome|CrMo)/(\\d+)"),
    UaRule("Chromium", "Chromium/", "Chromium/(\\d+)"),
    UaRule("Chrome", "Chrome/", "Chrome/(\\d+)"),
    UaRule("Firefox Mobile", "(?:Mobile|Tablet|Android).*Firefox/|Fennec/",
      "(?:Firefox|Fennec)/(\\d+)"),
    UaRule("SeaMonkey", "SeaMonkey/", "SeaMonkey/(\\d+)"),
    UaRule("Firefox", "Firefox/", "Firefox/(\\d+)"),
    UaRule("Mobile Safari", "Version/[\\d.]+.*Mobile.*Safari/", "Version/(\\d+)"),
    UaRule("Safari", "Version/[\\d.]+.*Safari/", "Version/(\\d+)"),
    UaRule("IE Mobile", "IEMobile", "IEMobile[ /](\\d+)"),
    UaRule("IE", "MSIE |Trident/", "(?:MSIE |rv:)(\\d+)"),
    UaRule("Konqueror", "[Kk]onqueror/", "[Kk]onqueror/(\\d+)"),
    UaRule("Electron", "Electron/", "Electron/(\\d+)"))

  /** One OS rule: family, detection regex, and EITHER a version regex
    * (group 1 = major) or a literal marketing version (the Windows NT
    * table — uap-core maps NT 6.1 ⇒ "7" etc.). */
  final case class OsRule(family: String, detect: String,
      versionRe: String = "", literal: String = "")

  val oses: Seq[OsRule] = Seq(
    OsRule("Windows Phone", "Windows Phone", "Windows Phone (?:OS )?(\\d+)"),
    OsRule("Windows", "Windows NT 10\\.0", literal = "10"),
    OsRule("Windows", "Windows NT 6\\.3", literal = "8.1"),
    OsRule("Windows", "Windows NT 6\\.2", literal = "8"),
    OsRule("Windows", "Windows NT 6\\.1", literal = "7"),
    OsRule("Windows", "Windows NT 6\\.0", literal = "Vista"),
    OsRule("Windows", "Windows NT 5\\.[12]", literal = "XP"),
    OsRule("Windows", "Windows"),
    OsRule("Chrome OS", "CrOS", "CrOS [a-z0-9_]+ (\\d+)"),
    OsRule("KaiOS", "KAIOS/", "KAIOS/(\\d+)"),
    OsRule("Tizen", "Tizen[ /]", "Tizen[ /](\\d+)"),
    OsRule("Android", "Android", "Android (\\d+)"),
    OsRule("iOS", "iPhone|iPad|iPod", "(?:iPhone OS|CPU OS) (\\d+)"),
    OsRule("Mac OS X", "Mac OS X", "Mac OS X (\\d+)"),
    OsRule("Ubuntu", "Ubuntu"),
    OsRule("Fedora", "Fedora"),
    OsRule("Debian", "Debian"),
    OsRule("FreeBSD", "FreeBSD"),
    OsRule("Linux", "Linux"))

  /** Android device model capture: `; <model> Build/` — the uap-core
    * generic-Android device pattern. */
  val AndroidModelRe: String = ";\\s*([^;)]+?)\\s+Build/"

  /** One referrer rule: source name, host regex, medium. Order: email
    * hosts precede search (mail.google.com is email, not google
    * search) — the snowplow referers.yml layering. */
  final case class RefererRule(source: String, hostRe: String, medium: String)

  val referers: Seq[RefererRule] = Seq(
    // email providers
    RefererRule("gmail", "^mail\\.google\\.", "email"),
    RefererRule("outlook", "^outlook\\.|(^|\\.)live\\.com$", "email"),
    RefererRule("yahoo-mail", "^mail\\.yahoo\\.", "email"),
    // search engines
    RefererRule("google", "(^|\\.)google\\.", "search"),
    RefererRule("bing", "(^|\\.)bing\\.", "search"),
    RefererRule("yahoo", "(^|\\.)yahoo\\.", "search"),
    RefererRule("duckduckgo", "(^|\\.)duckduckgo\\.", "search"),
    RefererRule("yandex", "(^|\\.)yandex\\.", "search"),
    RefererRule("baidu", "(^|\\.)baidu\\.", "search"),
    RefererRule("ecosia", "(^|\\.)ecosia\\.", "search"),
    RefererRule("ask", "(^|\\.)ask\\.com$", "search"),
    RefererRule("aol", "(^|\\.)search\\.aol\\.|(^|\\.)aolsearch\\.", "search"),
    RefererRule("naver", "(^|\\.)search\\.naver\\.", "search"),
    RefererRule("daum", "(^|\\.)search\\.daum\\.", "search"),
    RefererRule("seznam", "(^|\\.)seznam\\.", "search"),
    RefererRule("qwant", "(^|\\.)qwant\\.", "search"),
    RefererRule("startpage", "(^|\\.)startpage\\.", "search"),
    RefererRule("sogou", "(^|\\.)sogou\\.", "search"),
    RefererRule("so", "(^|\\.)so\\.com$", "search"),
    RefererRule("rambler", "(^|\\.)rambler\\.", "search"),
    RefererRule("brave", "^search\\.brave\\.", "search"),
    // social networks
    RefererRule("facebook", "(^|\\.)facebook\\.|^fb\\.me$", "social"),
    RefererRule("twitter", "(^|\\.)twitter\\.|(^|\\.)t\\.co$|(^|\\.)x\\.com$", "social"),
    RefererRule("linkedin", "(^|\\.)linkedin\\.|^lnkd\\.in$", "social"),
    RefererRule("reddit", "(^|\\.)reddit\\.", "social"),
    RefererRule("instagram", "(^|\\.)instagram\\.", "social"),
    RefererRule("pinterest", "(^|\\.)pinterest\\.", "social"),
    RefererRule("youtube", "(^|\\.)youtube\\.|(^|\\.)youtu\\.be$", "social"),
    RefererRule("tiktok", "(^|\\.)tiktok\\.", "social"),
    RefererRule("vk", "(^|\\.)vk\\.com$", "social"),
    RefererRule("weibo", "(^|\\.)weibo\\.", "social"),
    RefererRule("tumblr", "(^|\\.)tumblr\\.", "social"),
    RefererRule("quora", "(^|\\.)quora\\.", "social"),
    RefererRule("threads", "(^|\\.)threads\\.net$", "social"),
    RefererRule("snapchat", "(^|\\.)snapchat\\.", "social"),
    RefererRule("whatsapp", "(^|\\.)whatsapp\\.", "social"),
    RefererRule("telegram", "(^|\\.)telegram\\.|^t\\.me$", "social"),
    RefererRule("twitch", "(^|\\.)twitch\\.tv$", "social"),
    RefererRule("mastodon", "(^|\\.)mastodon\\.", "social"))

  /** Search-term query parameters, tried in order (q: most engines,
    * p: yahoo, text: yandex, wd: baidu, query: naver/daum/seznam). */
  val termParams: Seq[String] = Seq("q", "p", "text", "wd", "query")
}
