#!/bin/sh
# One chained full-workflow rehearsal on the real TPU (VERDICT r4 #2):
# arrows -> pretrain -> gram cache -> merge (interp + regmean, executed-
# reference bit-identity) -> merged-ufo fine-tune -> recall + ITM rerank
# -> VQA submission.  See tools/workflow_rehearsal.py for the stages.
exec python /root/repo/tools/workflow_rehearsal.py "$@"
