package graft.rdf

import scala.collection.mutable

/** Driver-side Turtle / TriG / N-Triples / N-Quads parser.
  *
  * Covers the grammar subset exercised by the reference's ten fixtures
  * (the .ttl and .trig files under /root/reference/src/test/resources — see
  * SURVEY.md §5):
  * prefix directives (re-definable mid-document, as group_by.ttl does),
  * IRIs, prefixed names, blank-node labels and `[]`, the `a` keyword,
  * predicate (`;`) and object (`,`) lists, plain/typed/language-tagged
  * literals, numeric shorthand (integer/decimal/double), booleans, and
  * TriG graph blocks `<g> { ... }`.
  *
  * This is a from-scratch implementation of the W3C grammars; the
  * reference instead delegates to rdf4j Rio
  * (/root/reference/src/main/scala/es/jolivar/scio/sparql/TriplesReader.scala:57-76).
  * Driver-side parsing is for fixtures and small files; the scale path is
  * line-splittable N-Triples/N-Quads via [[graft.io.QuadsIO.readNTriples]].
  */
final class TurtleParser(input: String) {
  private var pos = 0
  private val prefixes = mutable.Map.empty[String, String]
  private var base = ""
  private val quads = mutable.ArrayBuffer.empty[Quad]
  private var currentGraph: Option[Term] = None
  private var bnodeCounter = 0

  private def err(msg: String): Nothing = {
    val start = math.max(0, pos - 30)
    val ctx = input.substring(start, math.min(input.length, pos + 30))
    throw new IllegalArgumentException(s"Turtle parse error at offset $pos: $msg near ...$ctx...")
  }

  private def eof: Boolean = pos >= input.length
  private def peek: Char = if (eof) '\u0000' else input.charAt(pos)

  private def skipWs(): Unit = {
    var go = true
    while (go && !eof) {
      val c = input.charAt(pos)
      if (c == '#') { while (!eof && input.charAt(pos) != '\n') pos += 1 }
      else if (c.isWhitespace) pos += 1
      else go = false
    }
  }

  private def expect(c: Char): Unit = {
    skipWs()
    if (peek != c) err(s"expected '$c'")
    pos += 1
  }

  private def startsWithIgnoreCase(s: String): Boolean =
    input.regionMatches(true, pos, s, 0, s.length)

  def parse(): Seq[Quad] = {
    skipWs()
    while (!eof) {
      parseStatement()
      skipWs()
    }
    quads.toSeq
  }

  private def parseStatement(): Unit = {
    skipWs()
    if (startsWithIgnoreCase("@prefix")) {
      pos += 7; parsePrefixDecl(); expect('.')
    } else if (startsWithIgnoreCase("@base")) {
      pos += 5; skipWs(); base = parseIriRef(); expect('.')
    } else if (startsWithIgnoreCase("prefix") && keywordBoundary(6)) {
      pos += 6; parsePrefixDecl()
      skipWs(); if (peek == '.') pos += 1 // SPARQL-style PREFIX: dot optional
    } else if (startsWithIgnoreCase("base") && keywordBoundary(4)) {
      pos += 4; skipWs(); base = parseIriRef()
      skipWs(); if (peek == '.') pos += 1
    } else if (startsWithIgnoreCase("graph") && keywordBoundary(5)) {
      // TriG 1.1 `GRAPH labelOrSubject { … }` keyword form.
      // labelOrSubject is iri | BlankNode — same rejections as the
      // label-before-'{' path: no collections, no literals.
      pos += 5; skipWs()
      if (peek == '(') err("a collection cannot name a graph")
      val label = parseNode()
      if (label.isInstanceOf[Lit]) err("a literal cannot name a graph")
      skipWs(); expect('{')
      parseGraphBody(Some(label))
    } else {
      // TriG graph block or plain triples
      val save = pos
      if (peek == '{') { // anonymous default-graph block
        pos += 1
        parseGraphBody(None)
        return
      }
      val startedCollection = peek == '('
      val node = tryParseNode()
      skipWs()
      node match {
        case Some(t) if peek == '{' =>
          // TriG labelOrSubject is iri | BlankNode — a collection can
          // be a SUBJECT but never a graph label, and a literal can be
          // neither
          if (startedCollection) err("a collection cannot name a graph")
          if (t.isInstanceOf[Lit]) err("a literal cannot name a graph")
          pos += 1
          parseGraphBody(Some(t))
        case Some(t) =>
          if (t.isInstanceOf[Lit]) err("a literal cannot be a subject")
          parsePredicateObjectList(t)
          expect('.')
        case None =>
          pos = save
          err("expected statement")
      }
    }
  }

  private def isNameContinuation(offset: Int): Boolean = {
    val p = pos + offset
    p < input.length && (input.charAt(p).isLetterOrDigit || input.charAt(p) == '_')
  }

  /** True iff the char at pos+offset ENDS a keyword: not a PN name
    * char ('-', interior '.', '_', alnum) and not ':' (which would make
    * it a prefixed name like `base:x` — 'base'/'prefix' are legal
    * PN_PREFIX values). A '.' only continues a name when followed by a
    * letter/digit (else it is the statement terminator). */
  private def keywordBoundary(offset: Int): Boolean = {
    val p = pos + offset
    if (p >= input.length) return true
    val c = input.charAt(p)
    if (c.isLetterOrDigit || c == '_' || c == '-' || c == ':') false
    else if (c == '.' && p + 1 < input.length && input.charAt(p + 1).isLetterOrDigit) false
    else true
  }

  private def parseGraphBody(g: Option[Term]): Unit = {
    val prevGraph = currentGraph
    currentGraph = g
    skipWs()
    while (peek != '}') {
      val subj = parseNode()
      parsePredicateObjectList(subj)
      skipWs()
      if (peek == '.') { pos += 1; skipWs() }
      else if (peek != '}') err("expected '.' or '}' in graph block")
    }
    pos += 1 // consume '}'
    currentGraph = prevGraph
  }

  private def parsePrefixDecl(): Unit = {
    skipWs()
    val colon = input.indexOf(':', pos)
    if (colon < 0) err("expected prefix name")
    val name = input.substring(pos, colon).trim
    pos = colon + 1
    skipWs()
    val iri = parseIriRef()
    prefixes(name) = iri
  }

  private def parsePredicateObjectList(subj: Term): Unit = {
    var go = true
    while (go) {
      skipWs()
      val pred = parsePredicate()
      var objGo = true
      while (objGo) {
        skipWs()
        val obj = parseNode()
        emit(subj, pred, obj)
        skipWs()
        if (peek == ',') pos += 1 else objGo = false
      }
      skipWs()
      if (peek == ';') {
        pos += 1
        skipWs()
        // trailing ';' before '.' or '}' or ']' is legal
        if (peek == '.' || peek == '}' || peek == ']') go = false
      } else go = false
    }
  }

  private def emit(s: Term, p: Term, o: Term): Unit =
    quads += Quad(s, p, o, currentGraph)

  private def parsePredicate(): Term = {
    skipWs()
    if (peek == '(' || peek == '[')
      err("predicate must be an IRI, not a collection or blank node")
    if (peek == 'a' && keywordBoundary(1)) {
      pos += 1
      Iri(RDF.typ)
    } else parseNode() match {
      case i: Iri => i
      case other  => err(s"predicate must be an IRI, got $other")
    }
  }

  private def tryParseNode(): Option[Term] =
    try Some(parseNode()) catch { case _: IllegalArgumentException => None }

  private def parseNode(): Term = {
    skipWs()
    peek match {
      case '<' => Iri(parseIriRef())
      case '_' =>
        if (pos + 1 < input.length && input.charAt(pos + 1) == ':') {
          pos += 2
          val sb = new StringBuilder
          while (!eof && (peek.isLetterOrDigit || peek == '_' || peek == '-')) {
            sb += peek; pos += 1
          }
          BNode(sb.toString)
        } else err("expected blank node")
      case '[' =>
        pos += 1
        skipWs()
        bnodeCounter += 1
        val b = BNode(s"anon$bnodeCounter")
        if (peek != ']') { parsePredicateObjectList(b); skipWs() }
        expect(']')
        b
      case '(' =>
        // RDF collection: (a b c) → rdf:first/rest chain, () → rdf:nil
        pos += 1
        skipWs()
        val items = mutable.ArrayBuffer.empty[Term]
        while (!eof && peek != ')') {
          items += parseNode()
          skipWs()
        }
        if (eof) err("unterminated collection")
        pos += 1 // ')'
        RdfLists.chain(items.toSeq,
          () => { bnodeCounter += 1; BNode(s"anon$bnodeCounter") },
          (s, p, o) => emit(s, p, o))
      case '"' | '\'' => parseLiteral()
      case c if c == '+' || c == '-' || c.isDigit => parseNumericLiteral()
      case 't' if startsWithIgnoreCase("true") && keywordBoundary(4) =>
        pos += 4; Lit("true", XSD.boolean)
      case 'f' if startsWithIgnoreCase("false") && keywordBoundary(5) =>
        pos += 5; Lit("false", XSD.boolean)
      case _ => parsePrefixedName()
    }
  }

  private def parseIriRef(): String = {
    skipWs()
    if (peek != '<') err("expected IRI")
    pos += 1
    val end = input.indexOf('>', pos)
    if (end < 0) err("unterminated IRI")
    val iri = input.substring(pos, end)
    pos = end + 1
    TurtleParser.resolveIri(base, iri)
  }

  private def parsePrefixedName(): Term = {
    val sb = new StringBuilder
    while (!eof && (peek.isLetterOrDigit || peek == '_' || peek == '-' || peek == '.')) {
      sb += peek; pos += 1
    }
    if (peek != ':') err(s"expected prefixed name, got '${sb.toString}'")
    pos += 1
    val prefix = sb.toString
    val local = new StringBuilder
    while (!eof && (peek.isLetterOrDigit || peek == '_' || peek == '-' ||
           peek == '.' || peek == '%')) {
      local += peek; pos += 1
    }
    // a trailing '.' is the statement terminator, not part of the name
    while (local.nonEmpty && local.last == '.') { local.setLength(local.length - 1); pos -= 1 }
    val ns = prefixes.getOrElse(prefix, err(s"undefined prefix '$prefix:'"))
    Iri(ns + local.toString)
  }

  private def parseLiteral(): Term = {
    val quote = peek
    val triple = input.regionMatches(pos, s"$quote$quote$quote", 0, 3)
    val lex = new StringBuilder
    if (triple) {
      pos += 3
      while (!input.regionMatches(pos, s"$quote$quote$quote", 0, 3)) {
        if (eof) err("unterminated literal")
        if (peek == '\\') { pos += 1; lex ++= unescape(peek); pos += 1 }
        else { lex += peek; pos += 1 }
      }
      pos += 3
    } else {
      pos += 1
      while (peek != quote) {
        if (eof) err("unterminated literal")
        if (peek == '\\') { pos += 1; lex ++= unescape(peek); pos += 1 }
        else { lex += peek; pos += 1 }
      }
      pos += 1
    }
    // datatype or language tag
    if (peek == '^' && pos + 1 < input.length && input.charAt(pos + 1) == '^') {
      pos += 2
      val dt = parseNode() match {
        case Iri(v) => v
        case other  => err(s"datatype must be an IRI, got $other")
      }
      Lit(lex.toString, dt)
    } else if (peek == '@') {
      pos += 1
      val sb = new StringBuilder
      while (!eof && (peek.isLetterOrDigit || peek == '-')) { sb += peek; pos += 1 }
      Lit(lex.toString, lang = sb.toString)
    } else Lit(lex.toString)
  }

  /** Resolve one escape via the shared decoder; advances the cursor
    * past multi-char payloads (caller then does pos += 1 for the lead
    * char, so we rewind by one). */
  private def unescape(c: Char): String = {
    val (s, next) = TurtleParser.decodeEscape(input, pos, err)
    pos = next - 1
    s
  }

  private def parseNumericLiteral(): Term = {
    val start = pos
    if (peek == '+' || peek == '-') pos += 1
    var sawDot = false
    var sawExp = false
    var go = true
    while (go && !eof) {
      val c = peek
      if (c.isDigit) pos += 1
      else if (c == '.' && !sawDot && !sawExp &&
               pos + 1 < input.length && input.charAt(pos + 1).isDigit) {
        sawDot = true; pos += 1
      } else if ((c == 'e' || c == 'E') && !sawExp) { sawExp = true; pos += 1 }
      else if ((c == '+' || c == '-') && sawExp &&
               (input.charAt(pos - 1) == 'e' || input.charAt(pos - 1) == 'E')) pos += 1
      else go = false
    }
    val lex = input.substring(start, pos)
    if (lex.isEmpty || lex == "+" || lex == "-") err("bad numeric literal")
    val dt =
      if (sawExp) XSD.double
      else if (sawDot) XSD.decimal
      else XSD.integer
    Lit(lex, dt)
  }
}

object TurtleParser {
  private val schemePattern = "^[A-Za-z][A-Za-z0-9+.-]*:.*".r.pattern

  /** RFC 3986 resolution of a (possibly relative) IRI reference against
    * a base. An IRI with a scheme is absolute regardless of later ':'
    * characters (`frag#a:b` is still relative). Opaque bases (urn:,
    * mailto: — no hierarchical part) can't be resolved by java.net.URI,
    * which would silently RETURN the relative ref — concatenate instead. */
  def resolveIri(base: String, iri: String): String =
    if (base.isEmpty || schemePattern.matcher(iri).matches()) iri
    else try {
      val b = new java.net.URI(base)
      if (b.isOpaque) base + iri
      else {
        val r = b.resolve(iri).toString
        if (schemePattern.matcher(r).matches()) r else base + iri
      }
    } catch { case _: Exception => base + iri } // non-URI base: best effort

  /** Shared literal-escape decoding for the Turtle and SPARQL parsers:
    * cursor sits ON the char after the backslash; returns the decoded
    * text and the position AFTER the escape payload. Supports \\uXXXX
    * and \\UXXXXXXXX (surrogate pairs). */
  def decodeEscape(input: String, pos: Int,
                   fail: String => Nothing): (String, Int) = {
    if (pos >= input.length) fail("escape at end of input")
    def hex(from: Int, to: Int): Int =
      try Integer.parseInt(input.substring(from, to), 16)
      catch { case _: NumberFormatException =>
        fail(s"bad hex digits in escape: '${input.substring(from, to)}'") }
    input.charAt(pos) match {
      case 't' => ("\t", pos + 1)
      case 'n' => ("\n", pos + 1)
      case 'r' => ("\r", pos + 1)
      case 'b' => ("\b", pos + 1)
      case 'f' => ("\f", pos + 1)
      case 'u' =>
        if (pos + 5 > input.length) fail("truncated \\u escape")
        (hex(pos + 1, pos + 5).toChar.toString, pos + 5)
      case 'U' =>
        if (pos + 9 > input.length) fail("truncated \\U escape")
        val cp = hex(pos + 1, pos + 9)
        if (!Character.isValidCodePoint(cp))
          fail(f"invalid code point in \\U escape: U+$cp%X")
        (new String(Character.toChars(cp)), pos + 9)
      case other => (other.toString, pos + 1) // \" \' \\
    }
  }

  /** Parse a Turtle or TriG document into quads (g=None → default graph). */
  def parse(text: String): Seq[Quad] = new TurtleParser(text).parse()

  /** Parse one N-Triples / N-Quads line; None for blank/comment lines.
    * Line-splittable: this is the distributed-ingest workhorse. */
  def parseNTriplesLine(line: String): Option[Quad] = {
    val t = line.trim
    if (t.isEmpty || t.startsWith("#")) None
    else {
      val p = new TurtleParser(t)
      val s = p.parseNode()
      val pred = p.parsePredicate()
      val o = p.parseNode()
      p.skipWs()
      val g = if (p.peek != '.') Some(p.parseNode()) else None
      // the grammar is one statement per line: require the terminating
      // '.' and nothing after it (skipWs consumes a trailing comment) —
      // accepting a missing dot or trailing tokens would silently
      // mis-parse corrupt dumps
      p.skipWs()
      p.expect('.')
      p.skipWs()
      if (!p.eof) p.err("trailing content after '.'")
      // N-Triples terms are IRIREF / blank node LABELS / literals only.
      // Turtle-only [ … ] and ( … ) forms parse but push their
      // rdf:first/rest / property-list triples into this throwaway
      // parser's buffer — returning just the top quad would DROP them:
      // silent data loss, not a dropped line
      if (p.quads.nonEmpty)
        p.err("Turtle-only syntax ([…] or (…)) is not N-Triples")
      if (s.isInstanceOf[Lit]) p.err("a literal cannot be a subject")
      if (g.exists(_.isInstanceOf[Lit])) p.err("a literal cannot label a graph")
      Some(Quad(s, pred, o, g))
    }
  }
}
