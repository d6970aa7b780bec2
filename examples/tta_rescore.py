"""Rotation-TTA rescore of a trained ImagesFeatures checkpoint.

The poster's image-arm rows are the test-time-augmented variants: the final
CSV's "CNN" is `CNN only Aug` (0.73 vs 0.76 un-augmented) and "MiViT" is
`Transf(CNN + Feat) Aug` (outPoster/model_errors.csv), produced by averaging
predictions over 0/90/180/270° rotations
(trainSettingsImagesFeatures.py:255-300). An apples-to-apples comparison of
the image arms must therefore apply the same augmentation. This script
restores a saved `images_features` run and emits the TTA error tables next
to the plain ones.

Run: python examples/tta_rescore.py results/images_features_reconciled_scaled \
        [--seqs-per-d 256]
"""

import argparse
import json
import os
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("result_dir", help="run directory containing final/")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--seqs-per-d", type=int, default=64)
    args = ap.parse_args(argv)

    from moleculardiffusion_mivit_tpu.evaluation import save_error_table_csv
    from moleculardiffusion_mivit_tpu.experiments import get_experiment
    from moleculardiffusion_mivit_tpu.experiments.images_features import tta_error_tables
    from moleculardiffusion_mivit_tpu.utils import restore_experiment

    exp = get_experiment(
        "images_features",
        seed=args.seed,
        sequences_per_d=args.seqs_per_d,
        with_in_order=True,
    )
    exp.build()
    restore_experiment(exp, os.path.join(args.result_dir, "final"))

    d_values = exp.in_order_data["d_values"]
    tables = tta_error_tables(exp, exp.in_order_data, d_values)
    csv_path = os.path.join(args.result_dir, "tta_errors.csv")
    save_error_table_csv(tables, csv_path)
    print(json.dumps(tables, indent=2))
    print(f"TTA tables written to {csv_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
