"""Deterministic synthetic PTT terminal buffers — the S4 stand-in.

The reference drives term.ptt.cc over Selenium and regex-scrapes the screen
buffer (crawler/user.py:243-296). No terminal exists here, so buffers are a
pure function of (username, seed) shaped exactly like the text the
reference's pattern expects (登入次數/有效文章/上次上站/上次故鄉 fields).
A small fraction of buffers are 'error screens' that the pattern must reject
(the reference logs and skips them, crawler/user.py:275-278).
"""

from __future__ import annotations

import numpy as np

from . import images as img


def user_buffer(username: str, seed: int = 42) -> str:
    rng = np.random.default_rng(img.seed_for(f"user|{seed}|{username}"))
    if int(rng.integers(0, 13)) == 12:  # unparseable screen (user not found)
        return f"《ID暱稱》查無此人: {username}\n請重新輸入"
    login_times = int(rng.integers(1, 5000))
    valid = int(rng.integers(0, 900))
    mo, d = int(rng.integers(1, 13)), int(rng.integers(1, 29))
    hh, mm, ss = (int(rng.integers(0, 24)), int(rng.integers(0, 60)),
                  int(rng.integers(0, 60)))
    wk = ["Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun"][int(rng.integers(0, 7))]
    ip = ".".join(str(int(x)) for x in rng.integers(1, 255, 4))
    return (
        f"《ID暱稱》{username} (神人)\n"
        f"《經濟狀況》小康\n"
        f"《登入次數》{login_times} 次 (同天內只計一次)\n"
        f"《有效文章》{valid} 篇 (退:0)\n"
        f"《目前動態》不在站上\n"
        f"《私人信箱》最近無新信件\n"
        f"《上次上站》{mo:02d}/{d:02d}/2025 {hh:02d}:{mm:02d}:{ss:02d} {wk}\n"
        f"《上次故鄉》{ip}\n"
        f"《五子棋戰績》 0 勝 0 敗 0 和\n"
    )
