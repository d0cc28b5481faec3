#!/usr/bin/env bash
# Pending-TPU-work runner (VERDICT r3 item #8).
#
# Every outstanding TPU validation, re-derivable from the repo, in one
# committed script — so a relay outage or box reboot can never orphan
# the plan again (the r3 /tmp queue chain was lost to exactly that).
#
# Serializes everything through the single relay chip.  Each item is
# bounded by `timeout` and the queue continues past a failing bar
# (every accuracy_check writes its results JSON *before* asserting, so
# a miss still produces the artifact for the CI gate to judge).
#
# Usage:  bash demo/run_pending_tpu.sh [item ...]
#   items: video face iseg sweep swin vit gather bench_train
#   (default: all, in that order — short high-value bars first)
set -u
cd "$(dirname "$0")/.."
LOG=${TPU_QUEUE_LOG:-/tmp}
ITEMS=("$@")
# r5 closed every outstanding bar; the default is now the re-validation
# set a fresh checkout most wants confirmed (reference-config DETR-r50,
# the QAT bar, the int8 task sweep, the driver bench); the full menu
# below remains addressable by name
[ ${#ITEMS[@]} -eq 0 ] && ITEMS=(detr_r50 qat int8_sweep bench)

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "== [$(date +%H:%M:%S)] $name =="
  timeout "$t" "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  echo "== [$(date +%H:%M:%S)] $name rc=$rc (log $LOG/$name.log)"
  tail -3 "$LOG/$name.log" | sed 's/^/   /'
}

for item in "${ITEMS[@]}"; do case $item in
  video)  run video_bar  4000 python demo/video_classification/accuracy_check.py ;;
  face)   run face_bar   9000 python demo/face_recognition/accuracy_check.py ;;
  pfld)   run pfld_bar   9000 python demo/facial_landmark_detection/accuracy_check.py ;;
  iseg)   run iseg      10000 python demo/object_detection/accuracy_check_instance_seg.py ;;
  sweep)  run sweep     24000 python demo/object_detection/accuracy_sweep.py ;;
  int8_sweep) run int8_sweep 6000 python demo/object_detection/accuracy_sweep.py --int8 yolov3 ;;
  detr_r50) run detr_r50 9000 python demo/object_detection/accuracy_check_detr_r50.py ;;
  qat)    run qat_bar    4000 python demo/image_classification/accuracy_check_qat.py ;;
  swin)   run prof_swin  4000 python demo/image_classification/profile_swin.py ;;
  vit)    run prof_vit   4000 python demo/image_classification/profile_vit.py ;;
  gather) run gather     3600 python demo/object_detection/probe_gather_kernel.py ;;
  ocr)    run ocr_bar    6000 python demo/ocr/accuracy_check.py ;;
  gan)    run gan_bar    6000 python demo/gan/accuracy_check.py ;;
  cyclegan) run cyclegan_bar 6000 python demo/gan/accuracy_check_cyclegan.py ;;
  resnet_int8) run resnet_int8 7200 python demo/image_classification/profile_resnet_int8.py ;;
  int8_stages) run int8_stages 3600 python demo/image_classification/profile_resnet_int8_stages.py ;;
  bench_train) run bench_train 4000 python demo/image_classification/bench_train.py ;;
  swin_pack) run swin_pack 4000 python demo/image_classification/probe_swin_pack.py ;;
  hrnet_s2d) run hrnet_s2d 4000 python demo/image_segmentation/probe_hrnet_s2d.py ;;
  bench)  run bench      3600 python bench.py ;;
  *) echo "unknown item: $item" ;;
esac; done
echo "== ALL DONE =="
