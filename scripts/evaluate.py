#!/usr/bin/env python
"""Evaluate a trained VAD model over a split: write per-utterance hard/soft
frame predictions (+ wall-clock throughput report).

CLI covering the reference's evaluate_{audio,video,AV}_net.py scripts
(batch-1 spawn pools there; bucketed batched jit inference here).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from avvad_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--modality", choices=["audio", "video", "av"], required=True)
    p.add_argument("--data-root", default="data")
    p.add_argument("--dataset-size", choices=["subset", "complete"], default="subset")
    p.add_argument("--labels", default="vad_labels",
                   choices=["vad_labels", "ibm_labels"])
    p.add_argument("--upsampled", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--video-variant", default="auto",
                   choices=["auto", "upsampled", "normvideo", "plain"])
    p.add_argument("--split", default="test")
    p.add_argument("--checkpoint", required=True, help="checkpoint dir (Orbax)")
    p.add_argument("--output-dir", required=True,
                   help="where predictions land (classif_data_dir)")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--bucket", type=int, default=128)
    p.add_argument("--bucket-ladder", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="snap padded lengths onto the geometric bucket "
                        "ladder: O(log T) distinct XLA programs per split "
                        "instead of one per 128-frame class (identical "
                        "predictions; --no-bucket-ladder restores linear "
                        "bucketing)")
    p.add_argument("--prewarm", action="store_true",
                   help="AOT-compile all planned bucket shapes on a thread "
                        "pool before the eval loop: a cold run pays "
                        "max(compile times), not their sum (single-device)")
    p.add_argument("--lstm-hidden", type=int, default=1024)
    p.add_argument("--lstm-layers", type=int, default=2)
    p.add_argument("--mcb", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--tower-int8", action="store_true",
                   help="W8A8 video trunk (2x MXU int8 rate)")
    p.add_argument("--tower-quant-mode", default="dynamic",
                   choices=["dynamic", "static"],
                   help="int8 activation scales: per-tensor on the fly, or "
                        "calibrated static scales (int8-resident trunk; "
                        "fastest — see models/quantize.py)")
    p.add_argument("--mcb-fast", action="store_true",
                   help="run MCB fusion matmuls at DEFAULT precision (bf16 "
                        "inputs, f32 accumulation; ~6x the MXU rate, probs "
                        "move ~1e-6 — see BENCH_NOTES.md) instead of the "
                        "parity default fp32-HIGHEST")
    p.add_argument("--mcb-hoist", action="store_true",
                   help="store MCB sketches pre-folded into the DFT bases: "
                        "identical math with the constant fold matmuls "
                        "hoisted out of the jitted step (av + --mcb only)")
    p.add_argument("--tower-stem-int8", action="store_true",
                   help="quantize the stem conv too (input quantized with a "
                        "calibrated scale; lip frames are 8-bit pixels by "
                        "construction — see resnet._StemInt8)")
    p.add_argument("--tower-chunk", type=int, default=0,
                   help="frames per video-trunk pass (0 = single pass); "
                        "bounds peak tower activation memory for large "
                        "batch x bucket products")
    p.add_argument("--tower-chunk-unroll", action="store_true",
                   help="emit chunks as independent unrolled subgraphs "
                        "instead of a lax.scan (schedulable overlap; "
                        "compile time O(#chunks))")
    p.add_argument("--calibrate-split", default="train",
                   help="split that provides int8 calibration utterances")
    p.add_argument("--calibrate-utts", type=int, default=8)
    p.add_argument("--pallas-lstm", action="store_true",
                   help="use the weight-stationary Pallas LSTM kernel")
    p.add_argument("--lstm-state-quant", choices=["none", "bf16", "int8"],
                   default="none",
                   help="quantize the Pallas LSTM's recurrence state "
                        "(inference-only; requires --pallas-lstm; int8 = "
                        "W8A8 recurrent matmul at 2x the bf16 MXU rate)")
    p.add_argument("--tower-pallas", action="store_true",
                   help="fused Pallas int8 block kernels for the trunk "
                        "(requires --tower-int8 --tower-quant-mode static; "
                        "measured SLOWER than the XLA trunk on v5e — see "
                        "BENCH_NOTES.md — kept for parity/records)")
    p.add_argument("--data-parallel", type=int, default=0,
                   help="shard eval batches over a data-axis mesh of this "
                        "size (batch-size must divide it)")
    args = p.parse_args()
    # the model gates these on quant_int8, so without --tower-int8 they
    # would silently run the float trunk while the run is labeled
    # quantized/Pallas — reject the misconfiguration loudly instead
    if args.tower_stem_int8 and not args.tower_int8:
        p.error("--tower-stem-int8 requires --tower-int8")
    if args.lstm_state_quant != "none" and not args.pallas_lstm:
        p.error("--lstm-state-quant requires --pallas-lstm")
    if args.tower_pallas and not (args.tower_int8
                                  and args.tower_quant_mode == "static"):
        p.error("--tower-pallas requires --tower-int8 "
                "--tower-quant-mode static")
    if args.mcb_hoist and (args.modality != "av" or not args.mcb):
        p.error("--mcb-hoist requires --modality av with --mcb")
    return args


def main():
    args = parse_args()
    from avvad_tpu.config import LabelConfig
    from avvad_tpu.data import (AudioSequenceSource, AudioVisualSource,
                                VideoSequenceSource)
    from avvad_tpu.evaluate import evaluate_split
    from avvad_tpu.models import AVVAD, AudioVAD, VideoVAD
    from avvad_tpu.train import create_train_state, restore_checkpoint

    processed = os.path.join(args.data_root, args.dataset_size, "processed/")
    y_dim = LabelConfig(kind=args.labels).y_dim

    if args.modality == "audio":
        def make_source(split):
            return AudioSequenceSource(processed, split, args.dataset_size,
                                       args.labels, upsampled=args.upsampled)
        source = make_source(args.split)
        model = AudioVAD(y_dim=y_dim, lstm_hidden_size=args.lstm_hidden,
                         lstm_layers=args.lstm_layers,
                         use_pallas_lstm=args.pallas_lstm,
                         lstm_state_quant=args.lstm_state_quant)
        example = (jnp.zeros((1, 8, 513)),)
    elif args.modality == "video":
        def make_source(split):
            return VideoSequenceSource(processed, split, args.labels,
                                       upsampled=args.upsampled)
        source = make_source(args.split)
        model = VideoVAD(y_dim=y_dim, lstm_hidden_size=args.lstm_hidden,
                         lstm_layers=args.lstm_layers,
                         use_pallas_lstm=args.pallas_lstm,
                         lstm_state_quant=args.lstm_state_quant,
                         tower_int8=args.tower_int8,
                         tower_quant_mode=args.tower_quant_mode,
                         tower_pallas=args.tower_pallas,
                         tower_stem_int8=args.tower_stem_int8,
                         tower_chunk=args.tower_chunk,
                         tower_chunk_unroll=args.tower_chunk_unroll)
        example = (jnp.zeros((1, 4, 67, 67)),)
    else:
        def make_source(split):
            return AudioVisualSource(processed, split, args.dataset_size,
                                     args.labels, upsampled=args.upsampled,
                                     video_variant=args.video_variant)
        source = make_source(args.split)
        model = AVVAD(y_dim=y_dim, lstm_hidden_size=args.lstm_hidden,
                      lstm_layers=args.lstm_layers, use_mcb=args.mcb,
                      use_pallas_lstm=args.pallas_lstm,
                      lstm_state_quant=args.lstm_state_quant,
                      tower_int8=args.tower_int8,
                      tower_quant_mode=args.tower_quant_mode,
                      tower_pallas=args.tower_pallas,
                      tower_stem_int8=args.tower_stem_int8,
                      tower_chunk=args.tower_chunk,
                      tower_chunk_unroll=args.tower_chunk_unroll,
                      mcb_precision=(jax.lax.Precision.DEFAULT
                                     if args.mcb_fast
                                     else jax.lax.Precision.HIGHEST))
        example = (jnp.zeros((1, 4, 513)), jnp.zeros((1, 4, 67, 67)))

    print(f"{args.split} utterances: {len(source)}")
    state = create_train_state(model, jax.random.PRNGKey(0), example)
    state, norm_stats, epoch = restore_checkpoint(args.checkpoint, state,
                                                  with_opt=False)
    print(f"restored checkpoint epoch {epoch}; norm stats: "
          f"{sorted(norm_stats) if norm_stats else None}")

    if args.tower_int8 and args.tower_quant_mode == "static":
        from avvad_tpu.evaluate import calibrate_quant_scales

        cal_source = make_source(args.calibrate_split)
        state = calibrate_quant_scales(state, model, cal_source,
                                       args.modality, norm_stats=norm_stats,
                                       n_utts=args.calibrate_utts)
        print(f"calibrated int8 scales on {args.calibrate_utts} "
              f"{args.calibrate_split} utterances")

    if args.modality == "av" and args.mcb_hoist:
        # after restore + calibrate: fold the loaded (standard-layout)
        # sketches once on the host and swap in the folded-vars model
        from avvad_tpu.models.mcb import fold_sketch_collection

        model = model.clone(mcb_folded_vars=True)
        state = state.replace(
            apply_fn=model.apply,
            sketch=fold_sketch_collection({"sketch": state.sketch})["sketch"])
        print("MCB sketches pre-folded (hoisted fold)")

    mesh = None
    if args.data_parallel:
        from avvad_tpu.parallel import make_mesh

        mesh = make_mesh(n_data=args.data_parallel, n_model=1)
        print(f"eval mesh over {mesh.devices.size} devices")

    report = evaluate_split(state, source, args.modality,
                            args.output_dir + os.sep, norm_stats=norm_stats,
                            batch_size=args.batch_size, bucket=args.bucket,
                            bucket_ladder=args.bucket_ladder,
                            prewarm=args.prewarm, mesh=mesh)
    print(report)


if __name__ == "__main__":
    main()
