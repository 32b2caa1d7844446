"""CLI entry points (reference: scratchpad/cli/sp.py — typer `sp serve|chat|benchmark`).

argparse-based (typer is not in the image):

    sptpu serve  --model-path ... | --preset llama-3.2-1b --random-weights
    sptpu bench  --preset ...
    sptpu chat   --model-path ...
"""

from __future__ import annotations

import argparse
import sys

from scratchpad_tpu.config import ServerArgs


def _serve(args: argparse.Namespace) -> None:
    sargs = ServerArgs.from_cli_args(args)
    if sargs.num_nodes > 1 and sargs.node_rank > 0:
        # follower nodes run the SPMD shard + command replay, no HTTP
        # (reference: nodes with node_rank>=1 only run scheduler processes,
        # scratchpad/server/server.py:268-272)
        from scratchpad_tpu.server.engine import run_follower

        run_follower(sargs)
        return
    from scratchpad_tpu.server.http_server import launch_server

    launch_server(sargs)


def _bench(args: argparse.Namespace) -> None:
    import runpy

    runpy.run_path("bench.py", run_name="__main__")


def _chat(args: argparse.Namespace) -> None:
    from scratchpad_tpu.sampling.sampling_params import SamplingParams
    from scratchpad_tpu.server.engine import Engine

    engine = Engine(ServerArgs.from_cli_args(args))
    print("interactive chat; /exit to quit")
    history = []
    while True:
        try:
            user = input("you> ")
        except (EOFError, KeyboardInterrupt):
            break
        if user.strip() in ("/exit", "/quit"):
            break
        history.append({"role": "user", "content": user})
        tok = engine.tokenizer
        if tok is not None and getattr(tok, "chat_template", None):
            prompt = tok.apply_chat_template(
                history, tokenize=False, add_generation_prompt=True
            )
        else:
            prompt = "\n".join(f"{m['role']}: {m['content']}" for m in history)
        print("assistant> ", end="", flush=True)
        text = ""
        for chunk in engine.generate_stream(
            prompt=prompt,
            sampling_params=SamplingParams(temperature=0.7, max_new_tokens=512),
        ):
            sys.stdout.write(chunk["delta"])
            sys.stdout.flush()
            text += chunk["delta"]
        print()
        history.append({"role": "assistant", "content": text})


class _HttpScorer:
    """engine.score()-compatible scorer over /v1/completions echo+logprobs."""

    def __init__(self, base_url: str):
        self.base_url = base_url.rstrip("/")

    def score(self, input_ids):
        import json as _json
        import urllib.request

        body = _json.dumps(
            {
                "model": "model",
                "prompt": [list(map(int, input_ids))],
                "max_tokens": 0,
                "echo": True,
                "logprobs": 1,
            }
        ).encode()
        req = urllib.request.Request(
            f"{self.base_url}/v1/completions",
            data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=600) as resp:
            out = _json.loads(resp.read())
        lps = out["choices"][0]["logprobs"]["token_logprobs"]
        return [float(x) for x in lps if x is not None]


def _eval(args: argparse.Namespace) -> None:
    """Offline model evaluation (reference: `sp benchmark` wraps lm-eval over
    HTTP, cli/sp.py:59-68; this subcommand evaluates in-process and needs no
    network). JSONL rows are either {"text": ...} (corpus perplexity) or
    {"context": ..., "choices": [...], "label": i} (loglikelihood-ranked
    multiple choice, the lm-eval recipe). With --lm-eval TASK, delegates to
    the lm-eval harness when it is installed."""
    import json
    import math

    from scratchpad_tpu.server.engine import Engine

    if args.lm_eval:
        import importlib.util

        if importlib.util.find_spec("lm_eval") is None:
            sys.exit(
                "lm-eval is not installed in this image; use --eval-data "
                "JSONL for offline perplexity / multiple-choice evaluation"
            )
        if not args.base_url:
            sys.exit(
                "--lm-eval needs --base-url of a running `sptpu serve` "
                "endpoint (lm-eval drives the OpenAI completions API)"
            )
        # passthrough: run the harness against our served endpoint — the
        # reference's `sp benchmark` shape (reference: cli/sp.py:59-68)
        import subprocess

        cmd = [
            sys.executable, "-m", "lm_eval",
            "--model", "local-completions",
            "--model_args",
            (
                f"base_url={args.base_url}/v1/completions,"
                "model=model,tokenized_requests=False"
            ),
            "--tasks", args.lm_eval,
        ]
        if args.limit:
            cmd += ["--limit", str(args.limit)]
        raise SystemExit(subprocess.run(cmd).returncode)

    if args.base_url:
        # HTTP mode: score through a running server's echo+logprobs
        # completions (the reference lm-eval passthrough shape,
        # reference: cli/sp.py:59-68) — no local engine needed
        engine = _HttpScorer(args.base_url)
        tok = None
    else:
        engine = Engine(ServerArgs.from_cli_args(args))
        tok = engine.tokenizer
    rows = []
    with open(args.eval_data) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    if args.limit:
        rows = rows[: args.limit]

    def encode(text):
        assert tok is not None, "text rows need a tokenizer (--tokenizer-path)"
        return tok.encode(text)

    if rows and ("choices" in rows[0] or "choices_ids" in rows[0]):
        correct = 0
        for r in rows:
            ctx_ids = (
                list(r["context_ids"])
                if "context_ids" in r
                else encode(r["context"])
            )
            chs = (
                [list(c) for c in r["choices_ids"]]
                if "choices_ids" in r
                else [encode(c) for c in r["choices"]]
            )
            scores = []
            for ch in chs:
                lps = engine.score(ctx_ids + ch)
                scores.append(sum(lps[max(len(ctx_ids) - 1, 0) :]))
            correct += int(max(range(len(scores)), key=scores.__getitem__)
                           == r["label"])
        acc = correct / max(len(rows), 1)
        print(json.dumps({"metric": "accuracy", "value": acc, "n": len(rows)}))
    else:
        total_lp, total_tok = 0.0, 0
        for r in rows:
            ids = list(r["input_ids"]) if "input_ids" in r else encode(r["text"])
            if len(ids) < 2:
                continue
            lps = engine.score(ids)
            total_lp += sum(lps)
            total_tok += len(lps)
        ppl = math.exp(-total_lp / max(total_tok, 1))
        print(
            json.dumps(
                {"metric": "perplexity", "value": ppl, "tokens": total_tok}
            )
        )


def _version(args) -> None:
    import scratchpad_tpu

    print(scratchpad_tpu.__version__)


def main() -> None:
    parser = argparse.ArgumentParser(prog="sptpu")
    sub = parser.add_subparsers(dest="command", required=True)
    for name, fn in (("serve", _serve), ("bench", _bench), ("chat", _chat)):
        p = sub.add_parser(name)
        ServerArgs.add_cli_args(p)
        p.set_defaults(func=fn)
    pe = sub.add_parser("eval")
    ServerArgs.add_cli_args(pe)
    pe.add_argument("--eval-data", help="JSONL: {'text'} or {'context','choices','label'}")
    pe.add_argument("--limit", type=int, default=0)
    pe.add_argument("--lm-eval", default=None, help="lm-eval task name (if installed)")
    pe.add_argument(
        "--base-url",
        default=None,
        help="score via a running server's echo+logprobs completions "
        "instead of a local engine (lm-eval passthrough shape)",
    )
    pe.set_defaults(func=_eval)
    sub.add_parser("version").set_defaults(func=_version)
    ns = parser.parse_args()
    ns.func(ns)


if __name__ == "__main__":
    main()
