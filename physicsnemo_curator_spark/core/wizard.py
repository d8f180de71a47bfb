"""Interactive pipeline wizard — stdin/stdout parity with the
reference's Textual wizard (reference ``wiz/app.py:36-68`` and the
screen flow under ``wiz/screens/``: pick source → params → filters →
sink → save YAML or run).

The Textual widget layer itself is out of engine scope (SURVEY §2.8);
this module reproduces the *workflow* over plain prompts: browse the
registry, read each stage's parameters with signature-derived hints,
assemble an immutable :class:`~.pipeline.Pipeline`, save the versioned
YAML spec, optionally execute.  ``input_fn``/``print_fn`` injection
makes every screen scriptable, which is also how the tests drive it —
the reference tests its wizard the same way (``test/wiz/``).

Parameter values are parsed with ``yaml.safe_load`` so ``42``,
``true``, ``[a, b]`` and quoted strings all coerce the way the YAML
spec file itself would — the wizard can never produce a spec the
loader reads differently (the reference's ``_coerce_params`` guarantee,
``core/serialization.py:204-260``).
"""

from __future__ import annotations

import inspect
from typing import Any, Callable

import yaml

from physicsnemo_curator_spark.core import registry
from physicsnemo_curator_spark.core.pipeline import Pipeline
from physicsnemo_curator_spark.core.serialization import (
    save_pipeline,
    serialize_pipeline,
)

_FIRST_PARAM = {"source": "spark", "transform": "df", "sink": "df"}


def component_hint(kind: str, name: str) -> str:
    """One-line signature hint for a registered component: parameter
    names with defaults, minus the positional spark/df argument."""
    fn = {
        "source": registry.get_source,
        "transform": registry.get_transform,
        "sink": registry.get_sink,
    }[kind](name)
    parts = []
    for p in inspect.signature(fn).parameters.values():
        if p.name == _FIRST_PARAM[kind]:
            continue
        if p.kind is inspect.Parameter.VAR_KEYWORD:
            parts.append(f"**{p.name}")
        elif p.default is inspect.Parameter.empty:
            parts.append(p.name)
        else:
            parts.append(f"{p.name}={p.default!r}")
    return ", ".join(parts) or "(no parameters)"


def _parse_value(text: str) -> Any:
    try:
        return yaml.safe_load(text)
    except yaml.YAMLError:
        return text


def _prompt_params(
    ask: Callable[[str], str], show: Callable[[str], None], hint: str
) -> dict[str, Any]:
    show(f"  params: {hint}")
    show("  enter key=value per line, blank line to finish")
    params: dict[str, Any] = {}
    while True:
        line = ask("  > ").strip()
        if not line:
            return params
        if "=" not in line:
            show("  (expected key=value)")
            continue
        key, _, value = line.partition("=")
        params[key.strip()] = _parse_value(value.strip())


def _choose(
    ask: Callable[[str], str],
    show: Callable[[str], None],
    kind: str,
    names: list[str],
    allow_blank: bool = False,
) -> str | None:
    show(f"available {kind}s: {', '.join(names)}")
    while True:
        picked = ask(f"{kind}{' (blank to stop)' if allow_blank else ''}: ").strip()
        if not picked and allow_blank:
            return None
        if picked in names:
            return picked
        show(f"  unknown {kind} {picked!r}")


def run_wizard(
    input_fn: Callable[[str], str] = input,
    print_fn: Callable[[str], None] = print,
) -> Pipeline:
    """The four reference screens as prompts: source → transforms
    (repeat until blank) → sink (optional) → the assembled Pipeline.
    Raises nothing on bad entries — it re-prompts, like the TUI's
    validation."""
    reg = registry.registered()
    print_fn("physicsnemo-curator-spark pipeline wizard")
    src = _choose(input_fn, print_fn, "source", reg["sources"])
    pipeline = Pipeline.read(
        src, **_prompt_params(input_fn, print_fn, component_hint("source", src))
    )
    while True:
        t = _choose(
            input_fn, print_fn, "transform", reg["transforms"], allow_blank=True
        )
        if t is None:
            break
        pipeline = pipeline.transform(
            t, **_prompt_params(input_fn, print_fn, component_hint("transform", t))
        )
    s = _choose(input_fn, print_fn, "sink", reg["sinks"], allow_blank=True)
    if s is not None:
        pipeline = pipeline.write(
            s, **_prompt_params(input_fn, print_fn, component_hint("sink", s))
        )
    print_fn("spec:")
    print_fn(yaml.safe_dump(serialize_pipeline(pipeline), sort_keys=False))
    return pipeline


def main(
    argv: list[str] | None = None,
    input_fn: Callable[[str], str] = input,
    print_fn: Callable[[str], None] = print,
) -> None:
    """``python -m physicsnemo_curator_spark.core.wizard [out.yaml]`` —
    build interactively, save the spec, offer to run.  The CLI tail
    (save-path and run-now prompts) goes through the same
    ``input_fn``/``print_fn`` injection as :func:`run_wizard`, so the
    whole command is scriptable without monkeypatching builtins."""
    import sys

    args = sys.argv[1:] if argv is None else argv
    pipeline = run_wizard(input_fn, print_fn)
    out = (
        args[0]
        if args
        else input_fn("save spec to (blank to skip): ").strip()
    )
    if out:
        save_pipeline(pipeline, out)
        print_fn(f"wrote {out}")
    if input_fn("run now? [y/N]: ").strip().lower() == "y":
        from physicsnemo_curator_spark.session import get_spark

        result = pipeline.run(get_spark())
        print_fn(
            f"rows={result.rows} written={result.written} "
            f"wall_time_s={result.wall_time_s:.2f}"
        )


if __name__ == "__main__":
    main()
