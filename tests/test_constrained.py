"""Native grammar engine tests: regex DFA, JSON schema, e2e guided decoding."""

import json

import numpy as np
import pytest

from scratchpad_tpu.constrained.json_schema import schema_to_regex
from scratchpad_tpu.constrained.regex_fsm import compile_regex


def accepts(dfa, s: str) -> bool:
    st = dfa.walk(dfa.initial, s)
    return st >= 0 and dfa.is_accepting(st)


class TestRegexDFA:
    @pytest.mark.parametrize(
        "pattern,good,bad",
        [
            (r"abc", ["abc"], ["ab", "abcd", "abd"]),
            (r"a+b*", ["a", "aab", "abbb"], ["", "b", "ba"]),
            (r"(ab|cd)+", ["ab", "abcd", "cdcdab"], ["a", "abc", ""]),
            (r"\d{2,4}", ["12", "123", "1234"], ["1", "12345", "ab"]),
            (r"[a-c]x?", ["a", "bx"], ["d", "axx"]),
            (r"[^0-9]+", ["ab!", "xyz"], ["a1", ""]),
            (r"a.c", ["abc", "a!c"], ["a\nc", "ac"]),
            (r"yes|no", ["yes", "no"], ["maybe", "y"]),
            (r"\w+@\w+\.(com|org)", ["a_1@b.com"], ["a@b.net", "@b.com"]),
            (r"a{3}", ["aaa"], ["aa", "aaaa"]),
            (r"a{2,}", ["aa", "aaaa"], ["a"]),
        ],
    )
    def test_match(self, pattern, good, bad):
        dfa = compile_regex(pattern)
        for s in good:
            assert accepts(dfa, s), f"{pattern} should accept {s!r}"
        for s in bad:
            assert not accepts(dfa, s), f"{pattern} should reject {s!r}"

    def test_trimmed_states_are_live(self):
        dfa = compile_regex(r"ab|ac")
        # from every state some accepting state is reachable by construction
        assert dfa.num_states >= 2


class TestJsonSchema:
    def check(self, schema, good, bad):
        dfa = compile_regex(schema_to_regex(schema))
        for v in good:
            assert accepts(dfa, v), f"should accept {v}"
        for v in bad:
            assert not accepts(dfa, v), f"should reject {v}"

    def test_scalars(self):
        self.check({"type": "integer"}, ["0", "-12", "103"], ["01", "1.5", "x"])
        self.check({"type": "boolean"}, ["true", "false"], ["True", "1"])
        self.check(
            {"type": "string"}, ['"hi"', '""', '"a\\"b"'], ["hi", '"unterminated']
        )

    def test_enum(self):
        self.check(
            {"enum": ["red", "green", 3]},
            ['"red"', '"green"', "3"],
            ['"blue"', "4"],
        )

    def test_object(self):
        schema = {
            "type": "object",
            "properties": {
                "name": {"type": "string"},
                "age": {"type": "integer"},
            },
            "required": ["name", "age"],
        }
        self.check(
            schema,
            ['{"name": "bob", "age": 4}', '{"name":"x","age":0}'],
            ['{"age": 4, "name": "bob"}', '{"name": "bob"}', "{}"],
        )

    def test_array(self):
        self.check(
            {"type": "array", "items": {"type": "integer"}, "maxItems": 3},
            ["[]", "[1]", "[1, 2, 3]"],
            ["[1, 2, 3, 4]", '["a"]'],
        )

    @pytest.mark.slow  # 80s: deep PDA walk over generic JSON
    def test_generic_json(self):
        self.check(
            True,
            ['{"a": 1}', "[1, 2]", '"s"', "3.5", "null"],
            ["{", "]", "nul"],
        )


class CharTokenizer:
    """Toy char-level tokenizer: id = ord(char)+1, eos = 0."""

    eos_token_id = 0
    chat_template = None

    def encode(self, text):
        return [ord(c) + 1 for c in text]

    def decode(self, ids, **kw):
        return "".join(chr(i - 1) for i in ids if 0 < i <= 256)

    def get_vocab(self):
        raise AttributeError("no vocab")

    def __call__(self, *a, **k):
        raise NotImplementedError


class TestGuidedGeneration:
    @pytest.fixture(scope="class")
    def engine(self):
        from scratchpad_tpu.config import ServerArgs
        from scratchpad_tpu.server.engine import Engine

        args = ServerArgs(
            preset="tiny-debug",
            random_weights=True,
            dtype="float32",
            page_size=4,
            max_total_tokens=2048,
        )
        return Engine(args, tokenizer=CharTokenizer())

    def test_regex_constrained_output(self, engine):
        from scratchpad_tpu.sampling.sampling_params import SamplingParams

        sp = SamplingParams(
            temperature=0.0, max_new_tokens=12, regex=r"(yes|no)!"
        )
        out = engine.generate(prompt="q: ok? a:", sampling_params=sp)
        assert out.text in ("yes!", "no!"), out.text

    def test_json_constrained_output(self, engine):
        from scratchpad_tpu.sampling.sampling_params import SamplingParams

        schema = json.dumps(
            {
                "type": "object",
                "properties": {"ok": {"type": "boolean"}},
                "required": ["ok"],
            }
        )
        sp = SamplingParams(temperature=0.0, max_new_tokens=80, json_schema=schema)
        out = engine.generate(prompt="emit json:", sampling_params=sp)
        parsed = json.loads(out.text)
        assert set(parsed) == {"ok"} and isinstance(parsed["ok"], bool)


class TestJumpForward:
    def test_forced_next_token_api(self):
        from scratchpad_tpu.constrained.backend import CompiledGrammar
        from scratchpad_tpu.constrained.regex_fsm import compile_regex

        # char-level tokens: id = ord(c)+1
        strs = [None] * 300
        for i in range(256):
            strs[i + 1] = chr(i)
        dfa = compile_regex(r"yes!now")
        g = CompiledGrammar(dfa, strs, eos_ids={0})
        from scratchpad_tpu.constrained.backend import Grammar

        cur = Grammar(g)
        # from the start the whole literal is forced
        seq = []
        for _ in range(7):
            t = cur.forced_next_token()
            assert t is not None
            seq.append(chr(t - 1))
            cur.accept_token(t)
        assert "".join(seq) == "yes!now"

    def test_jump_forward_e2e_literal(self, engine=None):
        """A regex with a long forced literal must complete in far fewer
        model steps than tokens generated."""
        from scratchpad_tpu.config import ServerArgs
        from scratchpad_tpu.server.engine import Engine
        from scratchpad_tpu.sampling.sampling_params import SamplingParams

        eng = Engine(
            ServerArgs(
                preset="tiny-debug",
                random_weights=True,
                dtype="float32",
                page_size=4,
                max_total_tokens=2048,
            ),
            tokenizer=CharTokenizer(),
        )
        sp = SamplingParams(
            temperature=0.0,
            max_new_tokens=64,
            regex=r"(yes|no): the answer is final\.",
        )
        before = eng.scheduler.step_count
        out = eng.generate(prompt="q:", sampling_params=sp)
        steps = eng.scheduler.step_count - before
        assert out.text in (
            "yes: the answer is final.",
            "no: the answer is final.",
        ), out.text
        # ~27 chars generated; without jump-forward this needs 25+ steps
        assert steps < 12, steps
        eng.scheduler.check_memory_leak()


class TestNativeFsmKernel:
    """The C++ token-walk kernel (csrc/fsm.cpp) vs the Python DFA walk."""

    def test_native_matches_python_walk(self):
        import numpy as np
        from scratchpad_tpu.constrained.backend import CompiledGrammar
        from scratchpad_tpu.constrained.json_schema import schema_to_regex
        from scratchpad_tpu.constrained.regex_fsm import compile_regex

        schema = {
            "type": "object",
            "properties": {"a": {"type": "string"}, "n": {"type": "integer"}},
            "required": ["a", "n"],
        }
        dfa = compile_regex(schema_to_regex(schema))
        rng = np.random.default_rng(0)
        chars = list('abc012{}[]:," .-é')  # incl. non-ascii OTHER char
        toks = [
            "".join(rng.choice(chars, rng.integers(1, 6))) for _ in range(512)
        ]
        toks[3] = None
        toks[7] = ""
        native = CompiledGrammar(dfa, toks, {2})
        assert native._native is not None, "g++ kernel failed to build"
        python = CompiledGrammar(dfa, toks, {2})
        python._native = None
        for st in range(dfa.num_states):
            native._compute_state(st)
            python._compute_state(st)
            np.testing.assert_array_equal(
                native._bitmask[st], python._bitmask[st]
            )
            np.testing.assert_array_equal(
                native._token_dst[st], python._token_dst[st]
            )


class TestGenericJsonPDA:
    """Unconstrained response_format=json routes to the pushdown engine
    (exact, any nesting depth) instead of the depth-bounded regex."""

    def test_backend_routes_generic_json_to_pda(self):
        from scratchpad_tpu.constrained.backend import GrammarBackend
        from scratchpad_tpu.constrained.pda import CompiledPDAGrammar

        class _Tok:
            eos_token_id = 0

            def get_vocab(self):
                return {c: i + 1 for i, c in enumerate('{}[]":, 0123456789abn ul-')}

            def convert_tokens_to_string(self, toks):
                return "".join(toks)

        be = GrammarBackend(_Tok(), 32)
        g = be.get_grammar("json", "true")
        from scratchpad_tpu.constrained.pda import PDAGrammar

        assert isinstance(g, PDAGrammar)
        # typed schemas keep the DFA fast path
        g2 = be.get_grammar("json", '{"type": "integer"}')
        assert not isinstance(g2, PDAGrammar)

    def test_deep_json_beyond_regex_bound(self):
        from scratchpad_tpu.constrained.pda import PDA, GENERIC_JSON_EBNF

        p = PDA(GENERIC_JSON_EBNF)
        deep = "[" * 12 + "1" + "]" * 12  # regex translation bounds depth 3
        c = p.walk(p.initial_configs(), deep)
        assert c is not None and p.accepts(c)
        assert p.walk(p.initial_configs(), '{"a": 01}') is None


class TestStructuralTag:
    """structural_tag response format on the AC x structure product DFA
    (reference: constrained/xgrammar_backend.py:204 dispatch_structural_tag)."""

    TAG = {
        "structures": [
            {
                "begin": "<function=get_weather>",
                "schema": {
                    "type": "object",
                    "properties": {"city": {"type": "string"}},
                    "required": ["city"],
                },
                "end": "</function>",
            },
            {
                "begin": "<function=search>",
                "schema": {
                    "type": "object",
                    "properties": {"q": {"type": "string"}},
                    "required": ["q"],
                },
                "end": "</function>",
            },
        ],
        "triggers": ["<function="],
    }

    def _dfa(self):
        from scratchpad_tpu.constrained.structural_tag import (
            build_structural_tag_dfa,
        )

        return build_structural_tag_dfa(self.TAG)

    def test_acceptance(self):
        dfa = self._dfa()
        good = [
            "plain text, no calls at all",
            'x <function=get_weather>{"city": "Bern"}</function> y',
            '<function=search>{"q": "a"}</function><function=search>{"q": "b"}</function>',
        ]
        bad = [
            '<function=get_weather>{"q": "wrong schema"}</function>',
            '<function=get_weather>{"city": "Bern"}',  # missing end
            "<function=unknown>{}</function>",
            "<function=get_weather>",  # mid-structure EOS
        ]
        for s in good:
            assert accepts(dfa, s), s
        for s in bad:
            assert not accepts(dfa, s), s

    def test_free_text_mask_is_open(self):
        """In free text every printable char must remain allowed."""
        dfa = self._dfa()
        for c in "aZ9 !<":
            assert dfa.step(dfa.initial, c) >= 0, c

    def test_trigger_commits(self):
        """After the full trigger only structure begins may continue."""
        dfa = self._dfa()
        st = dfa.walk(dfa.initial, "<function=")
        assert st >= 0 and not dfa.is_accepting(st)
        assert dfa.walk(st, "get_weather>") >= 0
        assert dfa.walk(st, "zzz") == -1

    def test_backend_dispatch(self):
        from scratchpad_tpu.constrained.backend import GrammarBackend

        be = GrammarBackend(CharTokenizer(), vocab_size=257)
        g = be.get_grammar("structural_tag", json.dumps(self.TAG))
        mask = np.zeros(-(-257 // 32), np.uint32)
        g.fill_vocab_bitmask(mask, 257)
        # free text: char 'a' (id 98) allowed
        tid = ord("a") + 1
        assert (mask[tid // 32] >> (tid % 32)) & 1
        for ch in "<function=":
            g.accept_token(ord(ch) + 1)
        mask2 = np.zeros_like(mask)
        g.fill_vocab_bitmask(mask2, 257)
        # committed: 'z' banned, 'g'/'s' (begins) allowed, EOS banned
        zid = ord("z") + 1
        assert not (mask2[zid // 32] >> (zid % 32)) & 1
        gid = ord("g") + 1
        assert (mask2[gid // 32] >> (gid % 32)) & 1
        assert not mask2[0] & 1  # eos id 0

    def test_e2e_engine(self):
        """Greedy tiny-model output honors the structural constraint."""
        from scratchpad_tpu.config import ServerArgs
        from scratchpad_tpu.server.engine import Engine
        from scratchpad_tpu.sampling.sampling_params import SamplingParams

        args = ServerArgs(
            preset="tiny-debug",
            random_weights=True,
            dtype="float32",
            page_size=4,
            max_total_tokens=2048,
        )
        engine = Engine(args, tokenizer=CharTokenizer())
        tag = {
            "structures": [
                {
                    "begin": "<f>",
                    "schema": {"type": "boolean"},
                    "end": "</f>",
                }
            ],
            "triggers": ["<f>"],
        }
        sp = SamplingParams(
            temperature=0.0,
            max_new_tokens=24,
            structural_tag=json.dumps(tag),
        )
        out = engine.generate(prompt="go:", sampling_params=sp)
        # the output must be accepted by the tag DFA (free text and/or a
        # complete <f>true|false</f> structure; never a dangling structure)
        from scratchpad_tpu.constrained.structural_tag import (
            build_structural_tag_dfa,
        )

        dfa = build_structural_tag_dfa(tag)
        st = dfa.walk(dfa.initial, out.text)
        assert st >= 0 and dfa.is_accepting(st), out.text
