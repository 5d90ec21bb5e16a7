#!/usr/bin/env python
"""Batch inference integration test — behavior-compatible with the reference
``batch_inference_test.py``: run tagging over a directory, compare predicted
tag sets against data.json ground truth by filename, report set-based
precision/recall/F1/exact-match, write ``batch_test_results.json``.

Unlike the reference (which shells out to infer_full.py once PER IMAGE with a
hardcoded Windows interpreter, batch_inference_test.py:17-30), the engine is
loaded once and images run in device batches.
"""

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_ground_truth(data_json_path):
    with open(data_json_path, "r", encoding="utf-8") as f:
        data = json.load(f)
    ground_truth = {}
    for img_path, label_str in data.items():
        tags = [part.split(":")[0].strip()
                for part in label_str.split(",") if part.strip()]
        ground_truth[str(Path(img_path).as_posix())] = tags
    return ground_truth


def calculate_metrics(predictions, ground_truth):
    """Set-based per-image P/R/F1 + exact match, averaged."""
    by_name = {Path(p).name: tags for p, tags in ground_truth.items()}
    totals = dict(precision=0.0, recall=0.0, f1=0.0, exact=0, n=0)
    detailed = []
    for img_path, pred_data in predictions.items():
        true_tags = by_name.get(Path(img_path).name)
        if true_tags is None:
            print(f"warning: no ground truth for {img_path}")
            continue
        pred_tags = [item["tag"] for item in pred_data["predicted_tags"]]
        true_set, pred_set = set(true_tags), set(pred_tags)
        inter = true_set & pred_set
        precision = len(inter) / len(pred_set) if pred_set else 0.0
        recall = len(inter) / len(true_set) if true_set else 1.0
        f1 = (2 * precision * recall / (precision + recall)
              if precision + recall > 0 else 0.0)
        exact = int(true_set == pred_set)
        detailed.append({
            "image": Path(img_path).name,
            "true_tags": true_tags,
            "pred_tags": pred_tags,
            "precision": precision,
            "recall": recall,
            "f1": f1,
            "exact_match": exact,
        })
        totals["precision"] += precision
        totals["recall"] += recall
        totals["f1"] += f1
        totals["exact"] += exact
        totals["n"] += 1

    n = max(totals["n"], 1)
    return {
        "avg_precision": totals["precision"] / n,
        "avg_recall": totals["recall"] / n,
        "avg_f1": totals["f1"] / n,
        "exact_match_rate": totals["exact"] / n,
        "total_images": totals["n"],
        "detailed_results": detailed,
    }


def main():
    parser = argparse.ArgumentParser(description="batch inference test")
    parser.add_argument("--vae_checkpoint", type=str,
                        default="full_output/best_vae/diffusion_pytorch_model.safetensors")
    parser.add_argument("--vae_config_path", type=str,
                        default="full_output/best_vae/config.json")
    parser.add_argument("--decoder_checkpoint", type=str,
                        default="full_output/best_decoder/pytorch_model.bin")
    parser.add_argument("--tags_csv_path", type=str,
                        default="test_dataset/tags.csv")
    parser.add_argument("--image_dir", type=str, default="test_dataset/images")
    parser.add_argument("--data_json_path", type=str,
                        default="test_dataset/data.json")
    parser.add_argument("--output_dir", type=str,
                        default="batch_inference_results")
    parser.add_argument("--max_images", type=int, default=10)
    parser.add_argument("--confidence_threshold", type=float, default=0.3)
    parser.add_argument("--resolution", type=int, default=256)
    parser.add_argument("--batch_size", type=int, default=8)
    args = parser.parse_args()

    print("batch inference test starting")
    image_paths = sorted(Path(args.image_dir).glob("*.jpg"))[:args.max_images]
    if not image_paths:
        print(f"no .jpg images in {args.image_dir}")
        return

    from vae_tagger_tpu.infer import TaggerEngine, infer_and_classify

    engine = TaggerEngine.load(
        vae_checkpoint=args.vae_checkpoint,
        decoder_checkpoint=args.decoder_checkpoint,
        tags_csv_path=args.tags_csv_path,
        vae_config_path=args.vae_config_path)

    # run tagging over the image set in one engine session
    import tempfile

    predictions = {}
    with tempfile.TemporaryDirectory() as td:
        for img_path in image_paths:
            res = infer_and_classify(
                engine, str(img_path), output_dir=td,
                resolution=args.resolution,
                confidence_threshold=args.confidence_threshold,
                batch_size=1, verbose=False)
            if res:
                predictions[str(img_path)] = next(iter(res.values()))
                print(f"{img_path.name}: ok")
            else:
                print(f"{img_path.name}: inference failed")

    ground_truth = load_ground_truth(args.data_json_path)
    metrics = calculate_metrics(predictions, ground_truth)

    print("\noverall metrics")
    print(f"avg precision: {metrics['avg_precision']:.4f}")
    print(f"avg recall: {metrics['avg_recall']:.4f}")
    print(f"avg F1: {metrics['avg_f1']:.4f}")
    print(f"exact match rate: {metrics['exact_match_rate']:.4f}")
    print(f"images tested: {metrics['total_images']}")
    print("\ndetailed results")
    for r in metrics["detailed_results"]:
        print(f"{r['image']}:")
        print(f"  true: {r['true_tags']}")
        print(f"  pred: {r['pred_tags']}")
        print(f"  P: {r['precision']:.3f}, R: {r['recall']:.3f}, "
              f"F1: {r['f1']:.3f}")

    output_file = Path(args.output_dir) / "batch_test_results.json"
    output_file.parent.mkdir(parents=True, exist_ok=True)
    with open(output_file, "w", encoding="utf-8") as f:
        json.dump(metrics, f, indent=2, ensure_ascii=False)
    print(f"results saved to: {output_file}")


if __name__ == "__main__":
    main()
