"""Baseline-model harness — rebuild of `/root/reference/run_other_models.py`
(571 LoC top-level harness, its own metrics class + restricted model zoo).

Differences from `in_loop_train` replicated here:
  * model-name domain: ONLY meant / meant_vision / meant_tweet build fresh
    (`run_other_models.py:395-431`); anything else raises
    'Pass a valid model name.' — unless --hugging_face_model is given, which
    routes to the config-driven HF fine-tune path (`:391-394`) like the
    generic hug harness.
  * fixed seed 42 (`run_other_models.py:37`).
  * the harness's own metrics class REPORTS RECALL FROM THE PRECISION
    METRIC (`run_other_models.py:85-86`:
    `recall_macro = self.precision_macro.compute()`) — observable output
    replicated in the final reference-style metrics block; pass
    --fixed_metrics to print true recall instead (DEFECTS #27).
"""

from __future__ import annotations

from meant_tpu.cli.common import base_parser, str2bool

SUPPORTED = ("meant", "meant_vision", "meant_tweet")


def _reference_metrics_block(m: dict, set_name: str,
                             fixed_metrics: bool) -> list:
    """The reference harness's `metrics.show()` output
    (`run_other_models.py:91-105`), including the recall-is-precision copy
    bug at `:85-86` unless repaired."""
    recall_macro = m["recall_macro" if fixed_metrics else "precision_macro"]
    recall_micro = m["recall_micro" if fixed_metrics else "precision_micro"]
    lines = [
        (set_name + " accuracy: ", m["accuracy"]),
        ("Macro " + set_name + " f1: ", m["f1_macro"]),
        ("Micro " + set_name + " f1: ", m["f1_micro"]),
        ("Macro " + set_name + " precision: ", m["precision_macro"]),
        ("Micro " + set_name + " precision: ", m["precision_micro"]),
        ("Macro " + set_name + " recall: ", recall_macro),
        ("Micro " + set_name + " recall: ", recall_micro),
    ]
    for label, value in lines:
        print(label, value)
    return lines


def main(argv=None):
    import sys
    argv = list(sys.argv[1:] if argv is None else argv)
    parser = base_parser()
    parser.add_argument("--fixed_metrics", type=str2bool, nargs="?",
                        const=True, default=False,
                        help="report TRUE recall instead of the reference's "
                             "precision-for-recall copy bug (DEFECTS #27)")
    # None sentinel distinguishes "flag absent" (pin the reference's 42)
    # from any explicit value including 0 — and, unlike scanning argv for
    # the literal spelling, survives argparse prefix abbreviation (--see 7)
    parser.set_defaults(seed=None)
    args = parser.parse_args(argv)

    # strip the flag this harness owns before delegating to parsers that
    # don't know it
    fwd = []
    skip = False
    for i, a in enumerate(argv):
        if skip:
            skip = False
            continue
        if a.startswith("--fixed_metrics"):
            skip = ("=" not in a and i + 1 < len(argv)
                    and argv[i + 1].lower() in
                    ("yes", "true", "t", "y", "1", "no", "false", "f",
                     "n", "0"))
            continue
        fwd.append(a)

    if args.hugging_face_model:
        # `run_other_models.py:391-394`: HF config path (token
        # classification from local config JSON) — same engine as hug_train.
        from meant_tpu.cli.hug_train import main as hug_main
        return hug_main(fwd)

    if args.model_name not in SUPPORTED:
        raise ValueError("Pass a valid model name.")

    # torch.manual_seed(42), `run_other_models.py:37` — pin 42 only when the
    # flag was ABSENT; any explicit value (including 0 or an abbreviated
    # --see spelling) must stand. The delegate re-parses fwd, so forward the
    # resolved value explicitly: last occurrence wins there.
    fwd += ["--seed", "42" if args.seed is None else str(args.seed)]
    from meant_tpu.cli.in_loop_train import main as _main
    results = _main(fwd)

    if isinstance(results, dict) and results.get("test"):
        _reference_metrics_block(results["test"], "test", args.fixed_metrics)
    return results


if __name__ == "__main__":
    main()
