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
    from scratchpad_tpu.server.http_server import launch_server

    launch_server(ServerArgs.from_cli_args(args))


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
    sub.add_parser("version").set_defaults(func=_version)
    ns = parser.parse_args()
    ns.func(ns)


if __name__ == "__main__":
    main()
