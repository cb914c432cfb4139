package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML main-content extraction — the trafilatura/boilerpipe-class
  * head of a real pretraining pipeline (r14 verdict task #2): strip
  * script/style/comments, remove chrome containers
  * (nav/header/footer/aside), split the body into block elements,
  * drop high-link-density blocks (the classic boilerplate heuristic:
  * a block whose text is mostly anchor text is navigation, not
  * content), decode the common entities, and emit (title, main_text).
  *
  * Two design constraints shape the implementation:
  *  - it must be a NARROW MAP — per-document string work with no
  *    shuffle, so the operator scales exactly like the scan (a 100 TB
  *    crawl is extraction-bound, never exchange-bound);
  *  - every rule is stated in the RE2∩Java regex subset ((?s) inline
  *    flag, non-greedy, char classes; no backreferences, no
  *    lookaround) so the DuckDB oracle can run the IDENTICAL pipeline
  *    and the hash compare pins each step (x132).
  *
  * Scope, stated: this is the rule-based extractor class, not a DOM
  * parser — regex block splitting is exact on well-formed block
  * markup and degrades gracefully (identically in both engines) on
  * tag soup. The link-density test is integer-exact: a block is kept
  * iff 2·len(anchor text) < len(block text), so no float threshold
  * can wobble across engines.
  */
object Html {

  /** Block-level containers that are chrome, never content. */
  private val ChromeTags = "nav|header|footer|aside"

  /** Remove script/style payloads, comments, and chrome containers —
    * everything a text pipeline must never see.
    */
  def stripChrome(html: Column): Column = {
    val noScript = regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    regexp_replace(noComment,
      s"(?s)<($ChromeTags)[^>]*>.*?</($ChromeTags)>", " ")
  }

  /** The page title (inner text of the first <title>), trimmed. */
  def pageTitle(html: Column): Column =
    trim(regexp_extract(html, "(?s)<title[^>]*>(.*?)</title>", 1))

  /** Inner HTML of each <p> block, in document order. */
  def blocks(html: Column): Column =
    regexp_extract_all(stripChrome(html), lit("(?s)<p[^>]*>(.*?)</p>"), lit(1))

  /** Tag-stripped text of one block (whitespace NOT yet collapsed —
    * collapse happens once, after block concatenation).
    */
  def blockText(b: Column): Column = regexp_replace(b, "<[^>]*>", " ")

  /** Character count of the anchor-enclosed text within one block —
    * the numerator of the link-density test.
    */
  def anchorLen(b: Column): Column =
    length(array_join(
      regexp_extract_all(b, lit("(?s)<a[^>]*>(.*?)</a>"), lit(1)), ""))

  /** Keep predicate: 2·anchor chars < text chars (integer-exact). */
  def keepBlock(b: Column): Column =
    anchorLen(b) * 2 < length(regexp_replace(b, "<[^>]*>", ""))

  /** Decode the entities the corpus generator emits (the common five
    * plus nbsp); &amp; decodes LAST so '&amp;lt;' yields '&lt;', not
    * '<' — the single-pass rule every HTML entity decoder follows.
    */
  def decodeEntities(c: Column): Column = {
    val steps = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    steps.foldLeft(c) { case (acc, (from, to)) =>
      replace(acc, lit(from), lit(to)) // literal, not regex — both engines
    }
  }

  /** Finish extraction from an already-filtered block array: tag
    * strip → entity decode → whitespace collapse (lets callers keep
    * the block array as a named column instead of re-deriving it).
    */
  def mainFromKept(kept: Column): Column = {
    val joined = array_join(transform(kept, b => blockText(b)), " ")
    trim(regexp_replace(decodeEntities(joined), "\\s+", " "))
  }

  /** The full extraction: chrome-stripped blocks → link-density keep →
    * tag strip → entity decode → whitespace collapse.
    */
  def mainText(html: Column): Column =
    mainFromKept(filter(blocks(html), b => keepBlock(b)))

  /** Deterministic synthetic page for a document — the demo corpus
    * x132 and its oracle both generate (same arithmetic, same
    * concatenation) so extraction can be verified end-to-end without
    * crawl fixtures. Structure: head (title/style/script), nav chrome,
    * a comment, the text re-flowed as 12-token <p> blocks — every
    * (doc_id+i) % 4 == 0 block fully anchor-wrapped (must be dropped),
    * every % 4 == 1 block carrying a short trailing anchor (must be
    * kept), an entity-bearing closing paragraph, and an anchor-heavy
    * footer.
    */
  def synthPage(docId: Column, lang: Column, toks: Column): Column = {
    val id = docId.cast("string")
    val nPar = ceil(size(toks).cast("double") / 12.0).cast("int")
    val paras = transform(sequence(lit(0), greatest(nPar, lit(1)) - 1), i => {
      val p = array_join(slice(toks, i * 12 + 1, lit(12)), " ")
      when((docId + i) % 4 === 0,
        concat(lit("<p class=\"x\"><a href=\"/l?id="), i.cast("string"),
          lit("\">"), p, lit("</a></p>")))
        .when((docId + i) % 4 === 1,
          concat(lit("<p>"), p,
            lit(" <a href=\"/m\">see also</a></p>")))
        .otherwise(concat(lit("<p>"), p, lit("</p>")))
    })
    concat(
      lit("<html><head><title>Doc "), id,
      lit(" ("), lang, lit(")</title>"),
      lit("<style>p{margin:0} .x{color:#00f}</style>"),
      lit("<script type=\"text/javascript\">var n="), id,
      lit(";if(n>0){n+=1;}</script></head><body>"),
      lit("<nav><a href=\"/\">Home</a> <a href=\"/about\">About</a>" +
        " <a href=\"/contact\">Contact</a></nav>"),
      lit("<!-- rendered for "), id, lit(" -->"),
      array_join(paras, ""),
      lit("<p>Q&amp;A &lt;ok&gt; &quot;cited&quot;" +
        " &#39;quoted&#39;&nbsp;end of document</p>"),
      lit("<footer><a href=\"/privacy\">Privacy</a> &copy; 2026</footer>" +
        "</body></html>"))
  }
}
