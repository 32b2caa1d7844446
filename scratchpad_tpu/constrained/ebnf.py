"""GBNF-style EBNF grammars compiled onto the native regex DFA engine.

The reference delegates EBNF to xgrammar's pushdown automata
(reference: scratchpad/constrained/xgrammar_backend.py); this engine is
DFA-based, so the supported subset is NON-RECURSIVE grammars — each rule is
inlined (memoized, bounded) into one regular expression and compiled with
``compile_regex``. Recursive rules raise a clear error instead of silently
mis-constraining. In practice most guided-decoding grammars (enums,
formats, fixed JSON shapes, command languages) are regular; truly recursive
JSON should use ``json_schema`` instead, whose depth-bounded regex
translation lives in json_schema.py.

Syntax (llama.cpp GBNF):
    root  ::= "yes" | "no" ws answer
    answer ::= [a-z]+ ("," ws [a-z]+)*
    ws    ::= [ \\t]*
Literals in double quotes (with \\n \\t \\" \\\\ \\xNN escapes), char
classes, ( ) grouping, | alternation, postfix * + ? and {m,n}, and rule
references by name. ``#`` starts a comment.
"""

from __future__ import annotations

# chars that are metacharacters in the in-repo regex dialect
_META = set("\\^$.|?*+()[]{}")
_MAX_EXPANSION = 1 << 20  # bound memoized inlining blowup


def _esc_literal(ch: str) -> str:
    if ch in _META:
        return "\\" + ch
    if ch == "\n":
        return "\\n"
    if ch == "\t":
        return "\\t"
    if ch == "\r":
        return "\\r"
    o = ord(ch)
    if o < 0x20:
        return f"\\x{o:02x}"
    return ch


class _Tok:
    __slots__ = ("kind", "val")

    def __init__(self, kind, val):
        self.kind, self.val = kind, val

    def __repr__(self):
        return f"{self.kind}:{self.val!r}"


def _tokenize(src: str) -> list[_Tok]:
    toks: list[_Tok] = []
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if c == "#":
            while i < n and src[i] != "\n":
                i += 1
        elif c in " \t\r\n":
            i += 1
        elif src.startswith("::=", i):
            toks.append(_Tok("def", "::="))
            i += 3
        elif c == '"':
            i += 1
            lit = []
            while i < n and src[i] != '"':
                if src[i] == "\\":
                    e = src[i + 1]
                    if e == "x":
                        lit.append(chr(int(src[i + 2 : i + 4], 16)))
                        i += 4
                    else:
                        lit.append(
                            {"n": "\n", "t": "\t", "r": "\r"}.get(e, e)
                        )
                        i += 2
                else:
                    lit.append(src[i])
                    i += 1
            if i >= n:
                raise ValueError("unterminated string literal in EBNF")
            i += 1
            toks.append(_Tok("lit", "".join(lit)))
        elif c == "[":
            j = i + 1
            if j < n and src[j] == "^":
                j += 1
            if j < n and src[j] == "]":  # leading ] is literal
                j += 1
            while j < n and src[j] != "]":
                j += 2 if src[j] == "\\" else 1
            if j >= n:
                raise ValueError("unterminated char class in EBNF")
            toks.append(_Tok("class", src[i : j + 1]))
            i = j + 1
        elif c == "{":
            j = src.index("}", i)
            toks.append(_Tok("bound", src[i : j + 1]))
            i = j + 1
        elif c in "()|*+?":
            toks.append(_Tok(c, c))
            i += 1
        elif c.isalpha() or c in "_-":
            j = i
            while j < n and (src[j].isalnum() or src[j] in "_-"):
                j += 1
            toks.append(_Tok("name", src[i:j]))
            i = j
        else:
            raise ValueError(f"unexpected {c!r} in EBNF at offset {i}")
    return toks


class _RuleParser:
    """Per-rule parser producing a regex string with rule refs inlined."""

    def __init__(self, rules: dict[str, list[_Tok]], cache: dict[str, str]):
        self.rules = rules
        self.cache = cache
        self.stack: list[str] = []

    def expand(self, name: str) -> str:
        if name in self.cache:
            return self.cache[name]
        if name in self.stack:
            cycle = " -> ".join(self.stack + [name])
            raise ValueError(
                f"recursive EBNF rule ({cycle}): this engine compiles "
                "grammars to a DFA and supports only non-recursive rules; "
                "use json_schema for recursive JSON structures"
            )
        if name not in self.rules:
            raise ValueError(f"EBNF rule {name!r} is not defined")
        self.stack.append(name)
        toks = self.rules[name]
        regex = self._alternation(toks, [0])
        if len(regex) > _MAX_EXPANSION:
            raise ValueError(f"EBNF rule {name!r} expands past the size bound")
        self.stack.pop()
        self.cache[name] = regex
        return regex

    def _alternation(self, toks, pos) -> str:
        parts = [self._concat(toks, pos)]
        while pos[0] < len(toks) and toks[pos[0]].kind == "|":
            pos[0] += 1
            parts.append(self._concat(toks, pos))
        return "|".join(parts) if len(parts) > 1 else parts[0]

    def _concat(self, toks, pos) -> str:
        out = []
        while pos[0] < len(toks) and toks[pos[0]].kind not in ("|", ")"):
            out.append(self._postfix(toks, pos))
        return "".join(out)

    def _postfix(self, toks, pos) -> str:
        base = self._atom(toks, pos)
        while pos[0] < len(toks) and toks[pos[0]].kind in ("*", "+", "?", "bound"):
            t = toks[pos[0]]
            pos[0] += 1
            op = t.val if t.kind != "bound" else t.val
            base = f"(?:{base}){op}"
        return base

    def _atom(self, toks, pos) -> str:
        t = toks[pos[0]]
        pos[0] += 1
        if t.kind == "lit":
            return "".join(_esc_literal(c) for c in t.val)
        if t.kind == "class":
            return t.val
        if t.kind == "name":
            return f"(?:{self.expand(t.val)})"
        if t.kind == "(":
            inner = self._alternation(toks, pos)
            if pos[0] >= len(toks) or toks[pos[0]].kind != ")":
                raise ValueError("unbalanced paren in EBNF")
            pos[0] += 1
            return f"(?:{inner})"
        raise ValueError(f"unexpected token {t} in EBNF rule body")


def ebnf_to_regex(src: str, root: str = "root") -> str:
    """Compile a GBNF grammar source to one regex (non-recursive subset)."""
    toks = _tokenize(src)
    # split into rules at `name ::=` boundaries
    rules: dict[str, list[_Tok]] = {}
    i = 0
    while i < len(toks):
        if (
            i + 1 < len(toks)
            and toks[i].kind == "name"
            and toks[i + 1].kind == "def"
        ):
            name = toks[i].val
            i += 2
            body: list[_Tok] = []
            depth = 0
            while i < len(toks):
                if toks[i].kind == "(":
                    depth += 1
                elif toks[i].kind == ")":
                    depth -= 1
                if (
                    depth == 0
                    and i + 1 < len(toks)
                    and toks[i].kind == "name"
                    and toks[i + 1].kind == "def"
                ):
                    break
                body.append(toks[i])
                i += 1
            if not body:
                raise ValueError(f"empty EBNF rule {name!r}")
            rules[name] = body
        else:
            raise ValueError(f"expected 'name ::=' at token {toks[i]}")
    if root not in rules:
        raise ValueError(f"EBNF grammar has no {root!r} rule")
    return _RuleParser(rules, {}).expand(root)