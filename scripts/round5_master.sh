#!/usr/bin/env bash
# Round-5 master chip chain: serializes the remaining queue stages in
# VERDICT-priority order so the single TPU never idles across builder-session
# restarts. Launch detached (setsid) — each stage script owns its own log.
set -u
cd /root/repo
LOG=docs/round5/master.log
note() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

note "master chain start (pid $$)"
# 1. Finish the signature-strength curve (VERDICT #3): middle arm @ 1.0.
bash scripts/round5_queue.sh sig100;            note "A:sig100 rc=$?"
# 2. Flagship release + MoE hub path + cached host-fed run (VERDICT #1/#2/#5).
bash scripts/round5_queue_b.sh;                 note "B rc=$?"
# 3. 30K chained-resume ops soak (VERDICT #6).
bash scripts/round5_queue_c.sh;                 note "C rc=$?"
# 4. gamma=0.5 interior point (VERDICT #9 option b).
bash scripts/round5_queue.sh gamma05;           note "A:gamma05 rc=$?"
# 5. MoE efficiency sweep + ViT-L/G sweeps + final kernel gate/bench
#    (VERDICT #4/#8).
bash scripts/round5_queue_d.sh;                 note "D rc=$?"
note "master chain done"
