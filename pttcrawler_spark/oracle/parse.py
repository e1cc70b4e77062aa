"""Reference-faithful page parsing, pure Python (the oracle's parser).

Regex/format semantics lifted from /root/reference (cited per function);
the engine's Spark-side parse (functions/parse.py) must agree with this
module exactly — tests compare them field by field. Since our synthetic HTML
is regular, regexes substitute for BeautifulSoup DOM navigation; the one
simplification (documented in SURVEY.md §5): each non-tag LINE is a text
node for content cleaning, matching the line-oriented filter the reference
applies (crawler/article.py:326-339).
"""

from __future__ import annotations

import re
from datetime import datetime

# crawler/article.py:398-402 — getLastPage: ‹ link → group+1, default 1
RE_LAST_PAGE = re.compile(r'href="/bbs/\w+/index(\d+).html">&lsaquo;')
# crawler/article.py:444-459 — index entries; r-list-sep stops the scan
RE_INDEX_DIV = re.compile(r'<div class="(r-ent|r-list-sep)"[^>]*>(.*?)</div>\s*(?=<div|</div>|$)', re.S)
RE_HREF = re.compile(r'<a href="([^"]+)">')
# crawler/article.py:134-140 — parse_author
RE_AUTHOR = re.compile(r"([\S]*)\D\((.*)\)")
# crawler/article.py:122-128 — push ip+datetime (the %M:%S quirk is kept)
RE_PUSH_IPDT = re.compile(r"([\d.]*)\W?(\d{2}\/\d{2}\ \d{2}:\d{2})")
# crawler/article.py:320-324 — post ip from the 發信站 line
RE_IPV4 = re.compile(r"[0-9]*\.[0-9]*\.[0-9]*\.[0-9]*")
# crawler/article.py:331-333 — charset filter (keep CJK + punct + \s\w:/-_.?~%())
RE_CHARSET = re.compile(
    r"[^\u4e00-\u9fa5\u3002\uff1b\uff0c\uff1a\u201c\u201d\uff08\uff09\u3001\uff1f\u300a\u300b\s\w:/-_.?~%()]"
)
RE_META_VALUE = re.compile(r'<span class="article-meta-value">([^<]*)</span>')
# crawler/article.py:301-310 — F7 transcription (轉錄) fallback author/date
RE_TRANS = re.compile(
    r"\W(\w+)\W\([0-9]*\.[0-9]*\.[0-9]*\.[0-9]*\),"
    r"\W([0-9]+\/[0-9]+\/[0-9]+\W[0-9]+:[0-9]+:[0-9]+)")
TRANS_DATE_FMT = "%m/%d/%Y %H:%M:%S"  # crawler/article.py:308-309
PARSE_ERROR_MSG = "此文章被編輯過，解析出現問題。"  # crawler/article.py:313
RE_PUSH_DIV = re.compile(
    r'<div class="push"><span class="push-tag">([^<]*)</span>'
    r'<span class="push-userid">([^<]*)</span>'
    r'<span class="push-content">([^<]*)</span>'
    r'<span class="push-ipdatetime">([^<]*)</span></div>'
)
RE_TAG = re.compile(r"<[^>]+>")

DATE_FMT = "%a %b %d %H:%M:%S %Y"  # crawler/article.py:170


def get_last_page(html: str) -> int:
    m = RE_LAST_PAGE.search(html)
    return 1 if m is None else int(m.group(1)) + 1


def parse_index_entries(html: str) -> list[tuple[str, str]]:
    """→ [(web_id, href)] in DOM order, truncated at r-list-sep, entries
    without an <a> skipped (crawler/article.py:444-459)."""
    out = []
    for m in RE_INDEX_DIV.finditer(html):
        cls, body = m.group(1), m.group(2)
        if cls == "r-list-sep":
            break
        href_m = RE_HREF.search(body)
        if not href_m:
            continue  # deleted entry: div.find('a')['href'] raises → skipped
        href = href_m.group(1)
        web_id = re.sub(r"\.html", "", href.split("/")[-1])
        out.append((web_id, href))
    return out


def parse_author(author: str) -> str:
    if author:
        m = RE_AUTHOR.search(author)
        if m:
            return m.group(1)
    return author


def parse_push_ipdatetime(s: str):
    """→ (ip, datetime|None); strptime '%m/%d %M:%S' (sic) → year 1900,
    hour 0, minute/second from the HH:MM text (crawler/article.py:122-132)."""
    if s:
        m = RE_PUSH_IPDT.search(s)
        if m:
            return m.group(1), datetime.strptime(m.group(2), "%m/%d %M:%S")
    return None, None


def clean_content(lines: list[str], web_id: str) -> str:
    """crawler/article.py:326-339."""
    filtered = [v for v in (ln.strip() for ln in lines) if v and v[0] not in "※◆" and v[:2] != "--"]
    filtered = [RE_CHARSET.sub("", v) for v in filtered]
    filtered = [v for v in filtered if v]
    filtered = [v for v in filtered if web_id not in v]
    content = " ".join(filtered)
    return re.sub(r"(\s)+", " ", content)


def parse_article(html: str, web_id: str, board: str) -> dict:
    """Mirror of PttArticleCrawler.parse (crawler/article.py:265-384):
    one page → article fields + messages list + message_count."""
    metas = RE_META_VALUE.findall(html)
    author = metas[0] if len(metas) > 0 else ""
    title = metas[1] if len(metas) > 1 else ""
    date = metas[2] if len(metas) > 2 else ""

    # F7: no metalines → transcription fallback, else PostException-analog
    # (crawler/article.py:299-313; the caller's try/except at :472-483 makes
    # a raising article a skipped article)
    error = None
    if not metas:
        trans = None
        for line in html.split("\n"):
            if "※ 轉錄者:" in line:
                trans = RE_TAG.sub("", line)
                break
        if trans is not None:
            m = RE_TRANS.search(trans)
            if m:
                author = m.group(1)
                date = datetime.strptime(m.group(2), TRANS_DATE_FMT) \
                    .strftime(DATE_FMT)
        else:
            error = PARSE_ERROR_MSG

    pushes = RE_PUSH_DIV.findall(html)

    ip = None
    for line in html.split("\n"):
        if "※ 發信站:" in line:
            m = RE_IPV4.search(line)
            if m:
                ip = m.group()
            break

    # content: non-tag lines of main-content (metas & pushes & tags removed)
    body_lines = []
    for line in html.split("\n"):
        if "article-metaline" in line or 'class="push"' in line:
            continue
        text = RE_TAG.sub("", line)
        if text.strip():
            body_lines.append(text)
    content = clean_content(body_lines, web_id)

    messages, p, b, n = [], 0, 0, 0
    for tag, uid, pcontent, ipdt in pushes:
        tag = tag.strip(" \t\n\r")
        uid = uid.strip(" \t\n\r")
        pcontent = pcontent[1:].strip(" \t\n\r")  # drop leading ':' (crawler/article.py:352-354)
        ipdt = ipdt.strip(" \t\n\r")
        messages.append({"push_tag": tag, "push_userid": uid,
                         "push_content": pcontent, "push_ipdatetime": ipdt})
        if tag == "推":
            p += 1
        elif tag == "噓":
            b += 1
        else:
            n += 1

    return {
        "board": board,
        "article_id": web_id,
        "article_title": title,
        "author": author,
        "date": date,
        "content": content,
        "ip": ip,
        "error": error,
        "message_count": {"all": p + b + n, "count": p - b, "push": p, "boo": b, "neutral": n},
        "messages": messages,
    }


def parse_post_datetime(date_str: str):
    try:
        return datetime.strptime(date_str, DATE_FMT)
    except (ValueError, TypeError):
        return None  # crawler/article.py:169-172
