package graft.rdf

/** Minimal JSON AST + recursive-descent reader (zero deps), shared by
  * the JSON-LD and RDF/JSON parsers (and, outside rdf, the
  * exchange-budget file loader). */
private[graft] object Json {

  sealed trait J
  final case class JObj(fields: Vector[(String, J)]) extends J {
    def get(k: String): Option[J] = fields.collectFirst { case (`k`, v) => v }
  }
  final case class JArr(items: Vector[J]) extends J
  final case class JStr(s: String) extends J
  final case class JNum(raw: String) extends J
  final case class JBool(b: Boolean) extends J
  case object JNull extends J

  final class JsonReader(input: String) {
    private var pos = 0
    private def eof = pos >= input.length
    private def peek: Char = if (eof) 0.toChar else input.charAt(pos)
    private def ws(): Unit =
      while (!eof && Character.isWhitespace(peek)) pos += 1
    private def fail(msg: String) =
      throw new IllegalArgumentException(s"JSON error at offset $pos: $msg")
    private def expect(c: Char): Unit = {
      ws(); if (peek != c) fail(s"expected '$c', got '$peek'"); pos += 1
    }

    def parseValue(): J = {
      ws()
      peek match {
        case '{' => parseObj()
        case '[' => parseArr()
        case '"' => JStr(parseString())
        case 't' => literal("true"); JBool(true)
        case 'f' => literal("false"); JBool(false)
        case 'n' => literal("null"); JNull
        case c if c == '-' || c.isDigit => parseNum()
        case c => fail(s"unexpected '$c'")
      }
    }
    def parseDocument(): J = { val v = parseValue(); ws(); if (!eof) fail("trailing content"); v }

    private def literal(s: String): Unit = {
      if (!input.startsWith(s, pos)) fail(s"expected $s"); pos += s.length
    }
    private def parseObj(): JObj = {
      expect('{'); ws()
      val fs = Vector.newBuilder[(String, J)]
      if (peek == '}') { pos += 1; return JObj(fs.result()) }
      var go = true
      while (go) {
        ws(); val k = parseString(); expect(':'); val v = parseValue()
        fs += k -> v
        ws()
        if (peek == ',') pos += 1 else go = false
      }
      expect('}'); JObj(fs.result())
    }
    private def parseArr(): JArr = {
      expect('['); ws()
      val is = Vector.newBuilder[J]
      if (peek == ']') { pos += 1; return JArr(is.result()) }
      var go = true
      while (go) {
        is += parseValue(); ws()
        if (peek == ',') pos += 1 else go = false
      }
      expect(']'); JArr(is.result())
    }
    private def parseString(): String = {
      ws(); if (peek != '"') fail("expected string"); pos += 1
      val sb = new StringBuilder
      while (!eof && peek != '"') {
        val c = peek
        if (c == '\\') {
          pos += 1
          if (eof) fail("bad escape")
          peek match {
            case '"' => sb += '"'; case '\\' => sb += '\\'; case '/' => sb += '/'
            case 'b' => sb += '\b'; case 'f' => sb += '\f'; case 'n' => sb += '\n'
            case 'r' => sb += '\r'; case 't' => sb += '\t'
            case 'u' =>
              if (pos + 4 >= input.length) fail("bad \\u")
              sb += Integer.parseInt(input.substring(pos + 1, pos + 5), 16).toChar
              pos += 4
            case o => fail(s"bad escape \\$o")
          }
        } else sb += c
        pos += 1
      }
      if (eof) fail("unterminated string")
      pos += 1
      sb.toString
    }
    private def parseNum(): JNum = {
      val start = pos
      if (peek == '-') pos += 1
      while (!eof && (peek.isDigit || peek == '.' || peek == 'e' || peek == 'E' ||
             peek == '+' || peek == '-')) pos += 1
      if (pos == start) fail("bad number")
      val raw = input.substring(start, pos)
      // the greedy scan accepts '-'/'.'/exponent chars ANYWHERE; hold
      // the token to the actual JSON number grammar so "1-2"/"1.2.3"
      // fail here instead of minting invalid typed literals downstream
      if (!raw.matches("-?(0|[1-9][0-9]*)(\\.[0-9]+)?([eE][+-]?[0-9]+)?"))
        fail(s"bad number '$raw'")
      JNum(raw)
    }
  }
}
