"""Export pretrained patch CNNs as portable StableHLO artifacts.

Reference capability: convertJIT/convert_OriNet_and_AffNet_to_JIT.ipynb
(torch.jit traces of AffNet/OriNet).  Here: jax.export serialization with a
symbolic batch dimension; artifacts reload with affnet_tpu.export.load_from_file
on any machine with jax.

Usage: python -m affnet_tpu.cli.export_model AffNetFast exports/AffNet.stablehlo
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("model", help="registry name, e.g. AffNetFast, "
                                      "OriNetFast32, HardNet")
    parser.add_argument("output")
    parser.add_argument("--weights", default=None,
                        help=".npz weights (defaults to the converted "
                             "pretrained weights for that name)")
    args = parser.parse_args(argv)

    import jax
    from ..export import export_to_file, load_from_file
    from ..models import REGISTRY
    from ..models.convert import load_params_npz, load_pretrained

    net = REGISTRY[args.model]
    if args.weights:
        params = load_params_npz(args.weights)
    else:
        try:
            name = "OriNetFast" if args.model == "OriNetFast32" else args.model
            params = load_pretrained(name)
        except FileNotFoundError:
            print(f"(no pretrained weights for {args.model}; exporting "
                  f"randomly initialized)")
            params = net.init(jax.random.PRNGKey(0))

    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    export_to_file(net, params, args.output)
    # Round-trip smoke check.
    import numpy as np
    fn = load_from_file(args.output)
    out = fn(np.random.RandomState(0).rand(3, net.ps, net.ps)
             .astype(np.float32))
    print(f"{args.model} -> {args.output} "
          f"({os.path.getsize(args.output)} bytes; reloaded output "
          f"{np.asarray(out).shape})")


if __name__ == "__main__":
    main()
