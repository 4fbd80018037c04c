"""CJK transliteration tables: kana, Hangul (algorithmic), pinned Han subset.

Closes the last documented script-family gap vs the reference's
`deunicode` step (/root/reference/src/commands/dupes.rs:543): before
round 5, CJK-only names transliterated to empty and fell back to the raw
base, so near-dup name scoring could not see them. Conventions (pinned,
engine and DuckDB oracle move in LOCKSTEP — see clean.translit_duckdb):

  - kana (hiragana + katakana, incl. voiced/semi-voiced and small forms)
    map char-by-char to Hepburn-style romaji with NO separator — Japanese
    words are multi-kana, and the downstream tokenizer keeps letter runs
    together (ひらがな -> "hiragana").
  - Hangul syllables (U+AC00..U+D7A3) decompose ALGORITHMICALLY via the
    Unicode syllable formula into (lead, vowel, tail) jamo, romanized
    with the published Revised Romanization tables, one trailing space
    per syllable (the per-syllable word convention deunicode uses).
  - Han characters use a pinned subset of the highest-frequency
    simplified + traditional forms with toneless lowercase pinyin and a
    trailing space per char (deunicode's word-per-char convention; the
    multi-reading characters pin their most common reading). Characters
    outside the subset still drop — the subset is coverage, not a full
    Unihan table, and it is data, so extending it never changes code.

Outputs are lowercase (the cleaning pipeline lowercases immediately
after transliteration; keeping the tables lowercase halves their size
and keeps the DuckDB CASE arms byte-identical to the engine's dict).
"""

from __future__ import annotations

# --- kana -----------------------------------------------------------------

_HIRAGANA = {
    "あ": "a", "い": "i", "う": "u", "え": "e", "お": "o",
    "か": "ka", "き": "ki", "く": "ku", "け": "ke", "こ": "ko",
    "が": "ga", "ぎ": "gi", "ぐ": "gu", "げ": "ge", "ご": "go",
    "さ": "sa", "し": "shi", "す": "su", "せ": "se", "そ": "so",
    "ざ": "za", "じ": "ji", "ず": "zu", "ぜ": "ze", "ぞ": "zo",
    "た": "ta", "ち": "chi", "つ": "tsu", "て": "te", "と": "to",
    "だ": "da", "ぢ": "ji", "づ": "zu", "で": "de", "ど": "do",
    "な": "na", "に": "ni", "ぬ": "nu", "ね": "ne", "の": "no",
    "は": "ha", "ひ": "hi", "ふ": "fu", "へ": "he", "ほ": "ho",
    "ば": "ba", "び": "bi", "ぶ": "bu", "べ": "be", "ぼ": "bo",
    "ぱ": "pa", "ぴ": "pi", "ぷ": "pu", "ぺ": "pe", "ぽ": "po",
    "ま": "ma", "み": "mi", "む": "mu", "め": "me", "も": "mo",
    "や": "ya", "ゆ": "yu", "よ": "yo",
    "ら": "ra", "り": "ri", "る": "ru", "れ": "re", "ろ": "ro",
    "わ": "wa", "ゐ": "wi", "ゑ": "we", "を": "wo", "ん": "n",
    "ゔ": "vu",
    # small forms: same romaji as their full-size kana (monogram
    # convention; きゃ -> "kiya"); small tsu is the gemination marker
    # and carries no sound of its own
    "ぁ": "a", "ぃ": "i", "ぅ": "u", "ぇ": "e", "ぉ": "o",
    "ゃ": "ya", "ゅ": "yu", "ょ": "yo", "ゎ": "wa", "っ": "",
}

_KATAKANA = {
    "ア": "a", "イ": "i", "ウ": "u", "エ": "e", "オ": "o",
    "カ": "ka", "キ": "ki", "ク": "ku", "ケ": "ke", "コ": "ko",
    "ガ": "ga", "ギ": "gi", "グ": "gu", "ゲ": "ge", "ゴ": "go",
    "サ": "sa", "シ": "shi", "ス": "su", "セ": "se", "ソ": "so",
    "ザ": "za", "ジ": "ji", "ズ": "zu", "ゼ": "ze", "ゾ": "zo",
    "タ": "ta", "チ": "chi", "ツ": "tsu", "テ": "te", "ト": "to",
    "ダ": "da", "ヂ": "ji", "ヅ": "zu", "デ": "de", "ド": "do",
    "ナ": "na", "ニ": "ni", "ヌ": "nu", "ネ": "ne", "ノ": "no",
    "ハ": "ha", "ヒ": "hi", "フ": "fu", "ヘ": "he", "ホ": "ho",
    "バ": "ba", "ビ": "bi", "ブ": "bu", "ベ": "be", "ボ": "bo",
    "パ": "pa", "ピ": "pi", "プ": "pu", "ペ": "pe", "ポ": "po",
    "マ": "ma", "ミ": "mi", "ム": "mu", "メ": "me", "モ": "mo",
    "ヤ": "ya", "ユ": "yu", "ヨ": "yo",
    "ラ": "ra", "リ": "ri", "ル": "ru", "レ": "re", "ロ": "ro",
    "ワ": "wa", "ヰ": "wi", "ヱ": "we", "ヲ": "wo", "ン": "n",
    "ヴ": "vu",
    "ァ": "a", "ィ": "i", "ゥ": "u", "ェ": "e", "ォ": "o",
    "ャ": "ya", "ュ": "yu", "ョ": "yo", "ヮ": "wa", "ッ": "",
    "ー": "-",  # long-vowel mark; the tokenizer drops the dash
}

# CJK punctuation without NFKD compatibility decompositions (fullwidth
# ！？（） etc. decompose to ASCII on their own in the fallback branch)
_CJK_PUNCT = {
    "。": ".", "、": ",", "・": " ", "「": '"', "」": '"',
    "『": '"', "』": '"', "〜": "~",
}

# --- Hangul (algorithmic) -------------------------------------------------

HANGUL_BASE, HANGUL_LAST = 0xAC00, 0xD7A3
HANGUL_LEADS = [
    "g", "kk", "n", "d", "tt", "r", "m", "b", "pp", "s", "ss", "",
    "j", "jj", "ch", "k", "t", "p", "h",
]
HANGUL_VOWELS = [
    "a", "ae", "ya", "yae", "eo", "e", "yeo", "ye", "o", "wa", "wae",
    "oe", "yo", "u", "wo", "we", "wi", "yu", "eu", "ui", "i",
]
HANGUL_TAILS = [
    "", "g", "kk", "gs", "n", "nj", "nh", "d", "l", "lg", "lm", "lb",
    "ls", "lt", "lp", "lh", "m", "b", "bs", "s", "ss", "ng", "j", "ch",
    "k", "t", "p", "h",
]


def hangul_romanize(c: str) -> str | None:
    """Romanize one precomposed Hangul syllable (None if not one).
    Unicode syllable arithmetic: index = cp - AC00; lead = //588,
    vowel = %588//28, tail = %28. One trailing space per syllable."""
    o = ord(c)
    if not (HANGUL_BASE <= o <= HANGUL_LAST):
        return None
    i = o - HANGUL_BASE
    return (
        HANGUL_LEADS[i // 588]
        + HANGUL_VOWELS[(i % 588) // 28]
        + HANGUL_TAILS[i % 28]
        + " "
    )


# --- Han (pinned high-frequency subset, toneless pinyin) ------------------

_HAN_PINYIN = {
    # numerals & counting
    "一": "yi", "二": "er", "三": "san", "四": "si", "五": "wu",
    "六": "liu", "七": "qi", "八": "ba", "九": "jiu", "十": "shi",
    "百": "bai", "千": "qian", "万": "wan", "零": "ling", "两": "liang",
    # grammar / function words
    "的": "de", "了": "le", "是": "shi", "不": "bu", "在": "zai",
    "有": "you", "我": "wo", "你": "ni", "他": "ta", "她": "ta",
    "它": "ta", "们": "men", "这": "zhe", "那": "na", "和": "he",
    "与": "yu", "或": "huo", "而": "er", "也": "ye", "都": "dou",
    "很": "hen", "太": "tai", "就": "jiu", "还": "hai", "只": "zhi",
    "又": "you", "再": "zai", "最": "zui", "被": "bei", "把": "ba",
    "为": "wei", "于": "yu", "之": "zhi", "以": "yi", "所": "suo",
    # people & family
    "人": "ren", "大": "da", "小": "xiao", "子": "zi", "女": "nu",
    "男": "nan", "父": "fu", "母": "mu", "兄": "xiong", "弟": "di",
    "姐": "jie", "妹": "mei", "儿": "er", "友": "you", "民": "min",
    # common surnames
    "王": "wang", "李": "li", "张": "zhang", "刘": "liu", "陈": "chen",
    "杨": "yang", "黄": "huang", "赵": "zhao", "吴": "wu", "周": "zhou",
    "徐": "xu", "孙": "sun", "马": "ma", "朱": "zhu", "胡": "hu",
    "郭": "guo", "何": "he", "高": "gao", "林": "lin", "罗": "luo",
    "郑": "zheng", "梁": "liang", "谢": "xie", "宋": "song", "唐": "tang",
    # geography & direction
    "中": "zhong", "国": "guo", "天": "tian", "地": "di", "上": "shang",
    "下": "xia", "左": "zuo", "右": "you", "前": "qian", "后": "hou",
    "东": "dong", "南": "nan", "西": "xi", "北": "bei", "京": "jing",
    "海": "hai", "山": "shan", "水": "shui", "河": "he", "江": "jiang",
    "湖": "hu", "岛": "dao", "城": "cheng", "区": "qu", "县": "xian",
    "省": "sheng", "州": "zhou", "村": "cun", "路": "lu", "街": "jie",
    "桥": "qiao", "内": "nei", "外": "wai", "间": "jian", "边": "bian",
    # nature & time
    "火": "huo", "木": "mu", "金": "jin", "土": "tu", "日": "ri",
    "月": "yue", "年": "nian", "时": "shi", "分": "fen", "秒": "miao",
    "春": "chun", "夏": "xia", "秋": "qiu", "冬": "dong", "季": "ji",
    "风": "feng", "雨": "yu", "雪": "xue", "云": "yun", "雷": "lei",
    "光": "guang", "星": "xing", "花": "hua", "草": "cao", "树": "shu",
    "鸟": "niao", "鱼": "yu", "虫": "chong", "牛": "niu", "羊": "yang",
    "狗": "gou", "猫": "mao", "龙": "long", "虎": "hu",
    # colors
    "白": "bai", "黑": "hei", "红": "hong", "绿": "lu", "蓝": "lan",
    "色": "se", "青": "qing",
    # body & senses
    "头": "tou", "目": "mu", "口": "kou", "耳": "er", "手": "shou",
    "足": "zu", "身": "shen", "体": "ti", "心": "xin", "面": "mian",
    # verbs & actions
    "来": "lai", "去": "qu", "出": "chu", "入": "ru", "到": "dao",
    "从": "cong", "会": "hui", "能": "neng", "可": "ke", "要": "yao",
    "想": "xiang", "知": "zhi", "道": "dao", "见": "jian", "看": "kan",
    "听": "ting", "说": "shuo", "读": "du", "写": "xie", "学": "xue",
    "教": "jiao", "买": "mai", "卖": "mai", "开": "kai", "关": "guan",
    "行": "xing", "走": "zou", "跑": "pao", "飞": "fei", "游": "you",
    "坐": "zuo", "立": "li", "站": "zhan", "住": "zhu", "用": "yong",
    "作": "zuo", "做": "zuo", "爱": "ai", "喜": "xi", "笑": "xiao",
    "哭": "ku", "吃": "chi", "喝": "he", "打": "da", "放": "fang",
    "给": "gei", "找": "zhao", "问": "wen", "答": "da", "帮": "bang",
    # nouns: civilization
    "文": "wen", "字": "zi", "语": "yu", "词": "ci", "句": "ju",
    "书": "shu", "画": "hua", "音": "yin", "乐": "le", "歌": "ge",
    "名": "ming", "姓": "xing", "号": "hao", "家": "jia", "门": "men",
    "车": "che", "电": "dian", "话": "hua", "机": "ji", "网": "wang",
    "生": "sheng", "老": "lao", "师": "shi", "先": "xian", "工": "gong",
    "业": "ye", "事": "shi", "务": "wu", "员": "yuan", "部": "bu",
    "处": "chu", "室": "shi", "院": "yuan", "校": "xiao", "班": "ban",
    "公": "gong", "司": "si", "商": "shang", "品": "pin", "价": "jia",
    "钱": "qian", "市": "shi", "场": "chang", "店": "dian",
    "食": "shi", "饭": "fan", "茶": "cha", "酒": "jiu", "肉": "rou",
    "菜": "cai", "米": "mi",
    "数": "shu", "量": "liang", "计": "ji", "算": "suan", "法": "fa",
    "理": "li", "化": "hua", "物": "wu", "科": "ke", "技": "ji",
    "艺": "yi", "术": "shu", "医": "yi", "药": "yao", "病": "bing",
    # qualities
    "好": "hao", "新": "xin", "旧": "jiu", "长": "chang", "短": "duan",
    "多": "duo", "少": "shao", "全": "quan", "半": "ban", "几": "ji",
    "些": "xie", "每": "mei", "各": "ge", "另": "ling", "别": "bie",
    "力": "li", "气": "qi", "重": "zhong", "轻": "qing", "快": "kuai",
    "慢": "man", "早": "zao", "晚": "wan", "近": "jin", "远": "yuan",
    "真": "zhen", "假": "jia", "对": "dui", "错": "cuo", "正": "zheng",
    "反": "fan", "安": "an", "静": "jing", "平": "ping", "等": "deng",
    "级": "ji", "第": "di", "次": "ci", "回": "hui", "过": "guo",
    "现": "xian", "今": "jin", "明": "ming", "昨": "zuo",
    "信": "xin", "望": "wang", "思": "si", "意": "yi", "情": "qing",
    "汉": "han", "世": "shi", "界": "jie", "方": "fang", "同": "tong",
    "本": "ben", "港": "gang", "台": "tai", "湾": "wan",
    # countries / regions
    "美": "mei", "英": "ying", "德": "de", "俄": "e", "欧": "ou",
    "亚": "ya", "非": "fei", "印": "yin", "度": "du", "韩": "han",
    "朝": "chao", "越": "yue", "泰": "tai",
    # computing vocabulary (web corpora skew technical)
    "件": "jian", "代": "dai", "码": "ma", "序": "xu", "统": "tong",
    "系": "xi", "程": "cheng", "软": "ruan", "硬": "ying", "设": "she",
    "备": "bei", "器": "qi", "据": "ju", "库": "ku", "表": "biao",
    "格": "ge", "式": "shi", "版": "ban", "片": "pian", "图": "tu",
    "像": "xiang", "视": "shi", "频": "pin", "线": "xian",
    # common traditional forms
    "國": "guo", "學": "xue", "車": "che", "門": "men", "電": "dian",
    "馬": "ma", "鳥": "niao", "魚": "yu", "龍": "long", "愛": "ai",
    "聽": "ting", "說": "shuo", "讀": "du", "寫": "xie", "書": "shu",
    "長": "chang", "東": "dong", "樂": "le", "漢": "han", "語": "yu",
    "時": "shi", "間": "jian", "開": "kai", "關": "guan", "頭": "tou",
    "體": "ti", "點": "dian", "號": "hao", "話": "hua", "錢": "qian",
}

# Han entries carry deunicode's word-per-char trailing space
CJK_TABLE: dict[str, str] = {
    **_HIRAGANA,
    **_KATAKANA,
    **_CJK_PUNCT,
    **{c: p + " " for c, p in _HAN_PINYIN.items()},
}

# romanizations feed the lowercasing tokenizer directly: pure lowercase
# ascii letters only (punctuation maps are the separate exception)
assert all(
    v == "" or (v.isascii() and v.islower())
    for k, v in CJK_TABLE.items()
    if k not in _CJK_PUNCT and k != "ー"
), "CJK romanizations must be lowercase ascii"
