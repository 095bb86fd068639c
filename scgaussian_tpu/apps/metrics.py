"""Metrics CLI — `python -m scgaussian_tpu.apps.metrics -m <model_path>...`
(mirrors `metrics.py:120-128`)."""

from argparse import ArgumentParser

from scgaussian_tpu.eval.metrics import evaluate


def main(argv=None):
    from scgaussian_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    parser = ArgumentParser(description="Metrics script parameters")
    parser.add_argument("--model_paths", "-m", required=True, nargs="+", type=str)
    parser.add_argument("--no_lpips", action="store_true")
    args = parser.parse_args(argv)
    evaluate(args.model_paths, use_lpips=not args.no_lpips)


if __name__ == "__main__":
    main()
