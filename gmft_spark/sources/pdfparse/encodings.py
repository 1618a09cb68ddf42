"""Standard PDF font encodings and glyph-name → Unicode mapping.

Tables transcribed from the public PDF 1.7 specification (ISO 32000-1
Annex D) and the Adobe Glyph List (AGL). Only the subset needed for
Latin-script documents is carried; unknown names fall back through the
``uniXXXX`` conventions of the AGL specification.
"""

from __future__ import annotations

from typing import Dict, Optional

# Annex D.2 — Latin-text encodings. code -> glyph name.
# fmt: off
_STD_LOWER = {
    0o101: "A", 0o102: "B", 0o103: "C", 0o104: "D", 0o105: "E", 0o106: "F",
    0o107: "G", 0o110: "H", 0o111: "I", 0o112: "J", 0o113: "K", 0o114: "L",
    0o115: "M", 0o116: "N", 0o117: "O", 0o120: "P", 0o121: "Q", 0o122: "R",
    0o123: "S", 0o124: "T", 0o125: "U", 0o126: "V", 0o127: "W", 0o130: "X",
    0o131: "Y", 0o132: "Z",
    0o141: "a", 0o142: "b", 0o143: "c", 0o144: "d", 0o145: "e", 0o146: "f",
    0o147: "g", 0o150: "h", 0o151: "i", 0o152: "j", 0o153: "k", 0o154: "l",
    0o155: "m", 0o156: "n", 0o157: "o", 0o160: "p", 0o161: "q", 0o162: "r",
    0o163: "s", 0o164: "t", 0o165: "u", 0o166: "v", 0o167: "w", 0o170: "x",
    0o171: "y", 0o172: "z",
    0o060: "zero", 0o061: "one", 0o062: "two", 0o063: "three", 0o064: "four",
    0o065: "five", 0o066: "six", 0o067: "seven", 0o070: "eight", 0o071: "nine",
    0o040: "space", 0o041: "exclam", 0o042: "quotedbl", 0o043: "numbersign",
    0o044: "dollar", 0o045: "percent", 0o046: "ampersand",
    0o050: "parenleft", 0o051: "parenright", 0o052: "asterisk", 0o053: "plus",
    0o054: "comma", 0o055: "hyphen", 0o056: "period", 0o057: "slash",
    0o072: "colon", 0o073: "semicolon", 0o074: "less", 0o075: "equal",
    0o076: "greater", 0o077: "question", 0o100: "at",
    0o133: "bracketleft", 0o134: "backslash", 0o135: "bracketright",
    0o136: "asciicircum", 0o137: "underscore",
    0o173: "braceleft", 0o174: "bar", 0o175: "braceright", 0o176: "asciitilde",
}

STANDARD_ENCODING: Dict[int, str] = dict(_STD_LOWER)
STANDARD_ENCODING.update({
    0o047: "quoteright", 0o140: "quoteleft",
    0o241: "exclamdown", 0o242: "cent", 0o243: "sterling", 0o244: "fraction",
    0o245: "yen", 0o246: "florin", 0o247: "section", 0o250: "currency",
    0o251: "quotesingle", 0o252: "quotedblleft", 0o253: "guillemotleft",
    0o254: "guilsinglleft", 0o255: "guilsinglright", 0o256: "fi", 0o257: "fl",
    0o261: "endash", 0o262: "dagger", 0o263: "daggerdbl",
    0o264: "periodcentered", 0o266: "paragraph", 0o267: "bullet",
    0o270: "quotesinglbase", 0o271: "quotedblbase", 0o272: "quotedblright",
    0o273: "guillemotright", 0o274: "ellipsis", 0o275: "perthousand",
    0o277: "questiondown", 0o301: "grave", 0o302: "acute", 0o303: "circumflex",
    0o304: "tilde", 0o305: "macron", 0o306: "breve", 0o307: "dotaccent",
    0o310: "dieresis", 0o312: "ring", 0o313: "cedilla", 0o315: "hungarumlaut",
    0o316: "ogonek", 0o317: "caron", 0o320: "emdash",
    0o341: "AE", 0o343: "ordfeminine", 0o350: "Lslash", 0o351: "Oslash",
    0o352: "OE", 0o353: "ordmasculine", 0o361: "ae", 0o365: "dotlessi",
    0o370: "lslash", 0o371: "oslash", 0o372: "oe", 0o373: "germandbls",
})

WINANSI_ENCODING: Dict[int, str] = dict(_STD_LOWER)
WINANSI_ENCODING.update({
    0o047: "quotesingle", 0o140: "grave",
    0x80: "Euro", 0x82: "quotesinglbase", 0x83: "florin",
    0x84: "quotedblbase", 0x85: "ellipsis", 0x86: "dagger",
    0x87: "daggerdbl", 0x88: "circumflex", 0x89: "perthousand",
    0x8A: "Scaron", 0x8B: "guilsinglleft", 0x8C: "OE", 0x8E: "Zcaron",
    0x91: "quoteleft", 0x92: "quoteright", 0x93: "quotedblleft",
    0x94: "quotedblright", 0x95: "bullet", 0x96: "endash", 0x97: "emdash",
    0x98: "tilde", 0x99: "trademark", 0x9A: "scaron", 0x9B: "guilsinglright",
    0x9C: "oe", 0x9E: "zcaron", 0x9F: "Ydieresis",
    0xA0: "space", 0xA1: "exclamdown", 0xA2: "cent", 0xA3: "sterling",
    0xA4: "currency", 0xA5: "yen", 0xA6: "brokenbar", 0xA7: "section",
    0xA8: "dieresis", 0xA9: "copyright", 0xAA: "ordfeminine",
    0xAB: "guillemotleft", 0xAC: "logicalnot", 0xAD: "hyphen",
    0xAE: "registered", 0xAF: "macron", 0xB0: "degree", 0xB1: "plusminus",
    0xB2: "twosuperior", 0xB3: "threesuperior", 0xB4: "acute", 0xB5: "mu",
    0xB6: "paragraph", 0xB7: "periodcentered", 0xB8: "cedilla",
    0xB9: "onesuperior", 0xBA: "ordmasculine", 0xBB: "guillemotright",
    0xBC: "onequarter", 0xBD: "onehalf", 0xBE: "threequarters",
    0xBF: "questiondown", 0xC0: "Agrave", 0xC1: "Aacute", 0xC2: "Acircumflex",
    0xC3: "Atilde", 0xC4: "Adieresis", 0xC5: "Aring", 0xC6: "AE",
    0xC7: "Ccedilla", 0xC8: "Egrave", 0xC9: "Eacute", 0xCA: "Ecircumflex",
    0xCB: "Edieresis", 0xCC: "Igrave", 0xCD: "Iacute", 0xCE: "Icircumflex",
    0xCF: "Idieresis", 0xD0: "Eth", 0xD1: "Ntilde", 0xD2: "Ograve",
    0xD3: "Oacute", 0xD4: "Ocircumflex", 0xD5: "Otilde", 0xD6: "Odieresis",
    0xD7: "multiply", 0xD8: "Oslash", 0xD9: "Ugrave", 0xDA: "Uacute",
    0xDB: "Ucircumflex", 0xDC: "Udieresis", 0xDD: "Yacute", 0xDE: "Thorn",
    0xDF: "germandbls", 0xE0: "agrave", 0xE1: "aacute", 0xE2: "acircumflex",
    0xE3: "atilde", 0xE4: "adieresis", 0xE5: "aring", 0xE6: "ae",
    0xE7: "ccedilla", 0xE8: "egrave", 0xE9: "eacute", 0xEA: "ecircumflex",
    0xEB: "edieresis", 0xEC: "igrave", 0xED: "iacute", 0xEE: "icircumflex",
    0xEF: "idieresis", 0xF0: "eth", 0xF1: "ntilde", 0xF2: "ograve",
    0xF3: "oacute", 0xF4: "ocircumflex", 0xF5: "otilde", 0xF6: "odieresis",
    0xF7: "divide", 0xF8: "oslash", 0xF9: "ugrave", 0xFA: "uacute",
    0xFB: "ucircumflex", 0xFC: "udieresis", 0xFD: "yacute", 0xFE: "thorn",
    0xFF: "ydieresis",
})

MACROMAN_ENCODING: Dict[int, str] = dict(_STD_LOWER)
MACROMAN_ENCODING.update({
    0o047: "quotesingle", 0o140: "grave",
    0x80: "Adieresis", 0x81: "Aring", 0x82: "Ccedilla", 0x83: "Eacute",
    0x84: "Ntilde", 0x85: "Odieresis", 0x86: "Udieresis", 0x87: "aacute",
    0x88: "agrave", 0x89: "acircumflex", 0x8A: "adieresis", 0x8B: "atilde",
    0x8C: "aring", 0x8D: "ccedilla", 0x8E: "eacute", 0x8F: "egrave",
    0x90: "ecircumflex", 0x91: "edieresis", 0x92: "iacute", 0x93: "igrave",
    0x94: "icircumflex", 0x95: "idieresis", 0x96: "ntilde", 0x97: "oacute",
    0x98: "ograve", 0x99: "ocircumflex", 0x9A: "odieresis", 0x9B: "otilde",
    0x9C: "uacute", 0x9D: "ugrave", 0x9E: "ucircumflex", 0x9F: "udieresis",
    0xA0: "dagger", 0xA1: "degree", 0xA2: "cent", 0xA3: "sterling",
    0xA4: "section", 0xA5: "bullet", 0xA6: "paragraph", 0xA7: "germandbls",
    0xA8: "registered", 0xA9: "copyright", 0xAA: "trademark", 0xAB: "acute",
    0xAC: "dieresis", 0xAE: "AE", 0xAF: "Oslash", 0xB1: "plusminus",
    0xB4: "yen", 0xB5: "mu", 0xBB: "ordfeminine", 0xBC: "ordmasculine",
    0xBE: "ae", 0xBF: "oslash", 0xC0: "questiondown", 0xC1: "exclamdown",
    0xC2: "logicalnot", 0xC4: "florin", 0xC7: "guillemotleft",
    0xC8: "guillemotright", 0xC9: "ellipsis", 0xCA: "space", 0xCB: "Agrave",
    0xCC: "Atilde", 0xCD: "Otilde", 0xCE: "OE", 0xCF: "oe", 0xD0: "endash",
    0xD1: "emdash", 0xD2: "quotedblleft", 0xD3: "quotedblright",
    0xD4: "quoteleft", 0xD5: "quoteright", 0xD6: "divide",
    0xD8: "ydieresis", 0xD9: "Ydieresis", 0xDA: "fraction",
    0xDB: "currency", 0xDC: "guilsinglleft", 0xDD: "guilsinglright",
    0xDE: "fi", 0xDF: "fl", 0xE0: "daggerdbl", 0xE1: "periodcentered",
    0xE2: "quotesinglbase", 0xE3: "quotedblbase", 0xE4: "perthousand",
    0xE5: "Acircumflex", 0xE6: "Ecircumflex", 0xE7: "Aacute",
    0xE8: "Edieresis", 0xE9: "Egrave", 0xEA: "Iacute", 0xEB: "Icircumflex",
    0xEC: "Idieresis", 0xED: "Igrave", 0xEE: "Oacute", 0xEF: "Ocircumflex",
    0xF1: "Ograve", 0xF2: "Uacute", 0xF3: "Ucircumflex", 0xF4: "Ugrave",
    0xF5: "dotlessi", 0xF6: "circumflex", 0xF7: "tilde", 0xF8: "macron",
    0xF9: "breve", 0xFA: "dotaccent", 0xFB: "ring", 0xFC: "cedilla",
    0xFD: "hungarumlaut", 0xFE: "ogonek", 0xFF: "caron",
})
# fmt: on

BASE_ENCODINGS = {
    "StandardEncoding": STANDARD_ENCODING,
    "WinAnsiEncoding": WINANSI_ENCODING,
    "MacRomanEncoding": MACROMAN_ENCODING,
    "MacExpertEncoding": STANDARD_ENCODING,  # approximation (rare)
}

# Adobe Glyph List subset: glyph name -> unicode string.
# fmt: off
_AGL: Dict[str, str] = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@",
    "bracketleft": "[", "backslash": "\\", "bracketright": "]",
    "asciicircum": "^", "underscore": "_", "grave": "`",
    "braceleft": "{", "bar": "|", "braceright": "}", "asciitilde": "~",
    "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
    "quotesinglbase": "‚", "quotedblbase": "„",
    "endash": "–", "emdash": "—", "ellipsis": "…",
    "bullet": "•", "dagger": "†", "daggerdbl": "‡",
    "periodcentered": "·", "paragraph": "¶", "section": "§",
    "fi": "ﬁ", "fl": "ﬂ", "ff": "ﬀ", "ffi": "ﬃ",
    "ffl": "ﬄ",
    "exclamdown": "¡", "questiondown": "¿", "cent": "¢",
    "sterling": "£", "yen": "¥", "florin": "ƒ",
    "currency": "¤", "fraction": "⁄", "perthousand": "‰",
    "guillemotleft": "«", "guillemotright": "»",
    "guilsinglleft": "‹", "guilsinglright": "›",
    "degree": "°", "plusminus": "±", "multiply": "×",
    "divide": "÷", "logicalnot": "¬", "mu": "µ",
    "micro": "µ", "brokenbar": "¦", "copyright": "©",
    "registered": "®", "trademark": "™", "Euro": "€",
    "onesuperior": "¹", "twosuperior": "²",
    "threesuperior": "³", "onequarter": "¼", "onehalf": "½",
    "threequarters": "¾", "ordfeminine": "ª",
    "ordmasculine": "º",
    "dieresis": "¨", "acute": "´", "cedilla": "¸",
    "circumflex": "ˆ", "tilde": "˜", "macron": "¯",
    "breve": "˘", "dotaccent": "˙", "ring": "˚",
    "hungarumlaut": "˝", "ogonek": "˛", "caron": "ˇ",
    "dotlessi": "ı", "germandbls": "ß",
    "AE": "Æ", "ae": "æ", "OE": "Œ", "oe": "œ",
    "Oslash": "Ø", "oslash": "ø", "Lslash": "Ł",
    "lslash": "ł", "Thorn": "Þ", "thorn": "þ",
    "Eth": "Ð", "eth": "ð",
    "Scaron": "Š", "scaron": "š", "Zcaron": "Ž",
    "zcaron": "ž", "Ydieresis": "Ÿ", "ydieresis": "ÿ",
    "minus": "−", "asteriskmath": "∗", "infinity": "∞",
    "lessequal": "≤", "greaterequal": "≥", "notequal": "≠",
    "approxequal": "≈", "equivalence": "≡", "element": "∈",
    "arrowright": "→", "arrowleft": "←", "arrowup": "↑",
    "arrowdown": "↓", "arrowboth": "↔", "arrowdblright": "⇒",
    "arrowdblleft": "⇐", "arrowdblboth": "⇔",
    "partialdiff": "∂", "nabla": "∇", "summation": "∑",
    "product": "∏", "integral": "∫", "radical": "√",
    "proportional": "∝", "intersection": "∩", "union": "∪",
    "propersubset": "⊂", "propersuperset": "⊃",
    "reflexsubset": "⊆", "reflexsuperset": "⊇",
    "emptyset": "∅", "negationslash": "̸",
    "periodcentered.math": "⋅", "dotmath": "⋅",
    "angbracketleft": "⟨", "angbracketright": "⟩",
    "bardbl": "‖", "asteriskcentered": "∗",
    "circlemultiply": "⊗", "circleplus": "⊕",
    "openbullet": "◦", "diamond": "◇", "star": "⋆",
    "dollaroldstyle": "$", "centoldstyle": "¢",
    "zerooldstyle": "0", "oneoldstyle": "1", "twooldstyle": "2",
    "threeoldstyle": "3", "fouroldstyle": "4", "fiveoldstyle": "5",
    "sixoldstyle": "6", "sevenoldstyle": "7", "eightoldstyle": "8",
    "nineoldstyle": "9",
}
# Greek letters (common in the paper corpus)
_GREEK = {
    "Alpha": 0x0391, "Beta": 0x0392, "Gamma": 0x0393, "Delta": 0x0394,
    "Epsilon": 0x0395, "Zeta": 0x0396, "Eta": 0x0397, "Theta": 0x0398,
    "Iota": 0x0399, "Kappa": 0x039A, "Lambda": 0x039B, "Mu": 0x039C,
    "Nu": 0x039D, "Xi": 0x039E, "Omicron": 0x039F, "Pi": 0x03A0,
    "Rho": 0x03A1, "Sigma": 0x03A3, "Tau": 0x03A4, "Upsilon": 0x03A5,
    "Phi": 0x03A6, "Chi": 0x03A7, "Psi": 0x03A8, "Omega": 0x03A9,
    "alpha": 0x03B1, "beta": 0x03B2, "gamma": 0x03B3, "delta": 0x03B4,
    "epsilon": 0x03B5, "zeta": 0x03B6, "eta": 0x03B7, "theta": 0x03B8,
    "iota": 0x03B9, "kappa": 0x03BA, "lambda": 0x03BB,
    "nu": 0x03BD, "xi": 0x03BE, "omicron": 0x03BF, "pi": 0x03C0,
    "rho": 0x03C1, "sigma": 0x03C3, "sigma1": 0x03C2, "tau": 0x03C4,
    "upsilon": 0x03C5, "phi": 0x03C6, "chi": 0x03C7, "psi": 0x03C8,
    "omega": 0x03C9, "theta1": 0x03D1, "phi1": 0x03D5, "omega1": 0x03D6,
    "epsilon1": 0x03F5,
}
for _n, _cp in _GREEK.items():
    _AGL.setdefault(_n, chr(_cp))
# single letters / digits map to themselves
for _c in "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz":
    _AGL.setdefault(_c, _c)
# fmt: on


def glyph_name_to_unicode(name: str) -> Optional[str]:
    """AGL resolution incl. uniXXXX / uXXXX conventions and suffixes."""
    if not name:
        return None
    if name in _AGL:
        return _AGL[name]
    # strip AGL suffix (e.g. "a.sc", "one.taboldstyle")
    base = name.split(".", 1)[0]
    if base != name and base in _AGL:
        return _AGL[base]
    if base.startswith("uni") and len(base) >= 7:
        try:
            chunks = [base[i : i + 4] for i in range(3, len(base) - 3, 4)]
            return "".join(chr(int(c, 16)) for c in chunks if len(c) == 4)
        except ValueError:
            return None
    if base.startswith("u") and 5 <= len(base) <= 7:
        try:
            return chr(int(base[1:], 16))
        except ValueError:
            return None
    if len(base) == 1:
        return base
    # LaTeX oddities: gNN / cNN / index names — unknown
    return None


# CFF standard strings 0-390 (Type2 spec appendix A) — needed to resolve
# charset SIDs to glyph names. Only indices < 391 are predefined.
# fmt: off
CFF_STANDARD_STRINGS = (
    ".notdef", "space", "exclam", "quotedbl", "numbersign", "dollar",
    "percent", "ampersand", "quoteright", "parenleft", "parenright",
    "asterisk", "plus", "comma", "hyphen", "period", "slash", "zero", "one",
    "two", "three", "four", "five", "six", "seven", "eight", "nine", "colon",
    "semicolon", "less", "equal", "greater", "question", "at", "A", "B", "C",
    "D", "E", "F", "G", "H", "I", "J", "K", "L", "M", "N", "O", "P", "Q",
    "R", "S", "T", "U", "V", "W", "X", "Y", "Z", "bracketleft", "backslash",
    "bracketright", "asciicircum", "underscore", "quoteleft", "a", "b", "c",
    "d", "e", "f", "g", "h", "i", "j", "k", "l", "m", "n", "o", "p", "q",
    "r", "s", "t", "u", "v", "w", "x", "y", "z", "braceleft", "bar",
    "braceright", "asciitilde", "exclamdown", "cent", "sterling", "fraction",
    "yen", "florin", "section", "currency", "quotesingle", "quotedblleft",
    "guillemotleft", "guilsinglleft", "guilsinglright", "fi", "fl", "endash",
    "dagger", "daggerdbl", "periodcentered", "paragraph", "bullet",
    "quotesinglbase", "quotedblbase", "quotedblright", "guillemotright",
    "ellipsis", "perthousand", "questiondown", "grave", "acute",
    "circumflex", "tilde", "macron", "breve", "dotaccent", "dieresis",
    "ring", "cedilla", "hungarumlaut", "ogonek", "caron", "emdash", "AE",
    "ordfeminine", "Lslash", "Oslash", "OE", "ordmasculine", "ae",
    "dotlessi", "lslash", "oslash", "oe", "germandbls", "onesuperior",
    "logicalnot", "mu", "trademark", "Eth", "onehalf", "plusminus", "Thorn",
    "onequarter", "divide", "brokenbar", "degree", "thorn",
    "threequarters", "twosuperior", "registered", "minus", "eth",
    "multiply", "threesuperior", "copyright", "Aacute", "Acircumflex",
    "Adieresis", "Agrave", "Aring", "Atilde", "Ccedilla", "Eacute",
    "Ecircumflex", "Edieresis", "Egrave", "Iacute", "Icircumflex",
    "Idieresis", "Igrave", "Ntilde", "Oacute", "Ocircumflex", "Odieresis",
    "Ograve", "Otilde", "Scaron", "Uacute", "Ucircumflex", "Udieresis",
    "Ugrave", "Yacute", "Ydieresis", "Zcaron", "aacute", "acircumflex",
    "adieresis", "agrave", "aring", "atilde", "ccedilla", "eacute",
    "ecircumflex", "edieresis", "egrave", "iacute", "icircumflex",
    "idieresis", "igrave", "ntilde", "oacute", "ocircumflex", "odieresis",
    "ograve", "otilde", "scaron", "uacute", "ucircumflex", "udieresis",
    "ugrave", "yacute", "ydieresis", "zcaron", "exclamsmall",
    "Hungarumlautsmall", "dollaroldstyle", "dollarsuperior",
    "ampersandsmall", "Acutesmall", "parenleftsuperior",
    "parenrightsuperior", "twodotenleader", "onedotenleader",
    "zerooldstyle", "oneoldstyle", "twooldstyle", "threeoldstyle",
    "fouroldstyle", "fiveoldstyle", "sixoldstyle", "sevenoldstyle",
    "eightoldstyle", "nineoldstyle", "commasuperior",
    "threequartersemdash", "periodsuperior", "questionsmall", "asuperior",
    "bsuperior", "centsuperior", "dsuperior", "esuperior", "isuperior",
    "lsuperior", "msuperior", "nsuperior", "osuperior", "rsuperior",
    "ssuperior", "tsuperior", "ff", "ffi", "ffl", "parenleftinferior",
    "parenrightinferior", "Circumflexsmall", "hyphensuperior",
    "Gravesmall", "Asmall", "Bsmall", "Csmall", "Dsmall", "Esmall",
    "Fsmall", "Gsmall", "Hsmall", "Ismall", "Jsmall", "Ksmall", "Lsmall",
    "Msmall", "Nsmall", "Osmall", "Psmall", "Qsmall", "Rsmall", "Ssmall",
    "Tsmall", "Usmall", "Vsmall", "Wsmall", "Xsmall", "Ysmall", "Zsmall",
    "colonmonetary", "onefitted", "rupiah", "Tildesmall", "exclamdownsmall",
    "centoldstyle", "Lslashsmall", "Scaronsmall", "Zcaronsmall",
    "Dieresissmall", "Brevesmall", "Caronsmall", "Dotaccentsmall",
    "Macronsmall", "figuredash", "hypheninferior", "Ogoneksmall",
    "Ringsmall", "Cedillasmall", "questiondownsmall", "oneeighth",
    "threeeighths", "fiveeighths", "seveneighths", "onethird", "twothirds",
    "zerosuperior", "foursuperior", "fivesuperior", "sixsuperior",
    "sevensuperior", "eightsuperior", "ninesuperior", "zeroinferior",
    "oneinferior", "twoinferior", "threeinferior", "fourinferior",
    "fiveinferior", "sixinferior", "seveninferior", "eightinferior",
    "nineinferior", "centinferior", "dollarinferior", "periodinferior",
    "commainferior", "Agravesmall", "Aacutesmall", "Acircumflexsmall",
    "Atildesmall", "Adieresissmall", "Aringsmall", "AEsmall",
    "Ccedillasmall", "Egravesmall", "Eacutesmall", "Ecircumflexsmall",
    "Edieresissmall", "Igravesmall", "Iacutesmall", "Icircumflexsmall",
    "Idieresissmall", "Ethsmall", "Ntildesmall", "Ogravesmall",
    "Oacutesmall", "Ocircumflexsmall", "Otildesmall", "Odieresissmall",
    "OEsmall", "Oslashsmall", "Ugravesmall", "Uacutesmall",
    "Ucircumflexsmall", "Udieresissmall", "Yacutesmall", "Thornsmall",
    "Ydieresissmall", "001.000", "001.001", "001.002", "001.003", "Black",
    "Bold", "Book", "Light", "Medium", "Regular", "Roman", "Semibold",
)
# fmt: on
