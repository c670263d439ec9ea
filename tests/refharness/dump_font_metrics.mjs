// Dump the reference's built-in raw font registry (fontContainerMain.js
// loadBuiltInFontsRaw, the same 'latin' glyph set `scribe.init({font:true})`
// loads) to JSON: per-face cmap, glyph metrics, nonzero kerning pairs, and
// the os2/header fields writeHtml.js calcFontMetrics reads.  The output is
// a pure DATA table (numeric metrics of the open-licensed URW/Carlito/...
// fonts the reference ships); scribe_js_ray/data/ref_font_metrics.json.gz
// is generated from it for the positioned-HTML export port.
//
// Usage: node dump_font_metrics.mjs [latin|all] > metrics.json
import { loadBuiltInFontsRaw } from '/root/reference/js/fontContainerMain.js';
import { GlobalFonts } from '/root/reference/js/containers/fontContainer.js';

const glyphSet = process.argv[2] || 'latin';
await loadBuiltInFontsRaw(glyphSet);

const out = { glyphSet, fonts: {} };

for (const family of Object.keys(GlobalFonts.raw)) {
  for (const style of Object.keys(GlobalFonts.raw[family])) {
    const fontI = GlobalFonts.raw[family][style];
    if (!fontI || !fontI.opentype) continue;
    const ot = fontI.opentype;
    const os2 = ot.tables.os2 || {};

    // cp -> gid for every codepoint in the cmap.
    const cmapObj = {};
    const glyphIndexMap = ot.tables.cmap.glyphIndexMap;
    const cps = Object.keys(glyphIndexMap).map(Number).sort((a, b) => a - b);
    for (const cp of cps) cmapObj[cp] = glyphIndexMap[cp];

    // gid -> [advanceWidth, xMin, xMax, yMin, yMax, hasPath]
    const gids = new Set(Object.values(cmapObj));
    gids.add(0); // .notdef fallback used by charToGlyph for unmapped chars
    const glyphs = {};
    for (const gid of gids) {
      const g = ot.glyphs.get(gid);
      const m = g.getMetrics();
      const num = (v) => (typeof v === 'number' && Number.isFinite(v) ? v : null);
      glyphs[gid] = [
        num(g.advanceWidth), num(m.xMin), num(m.xMax), num(m.yMin), num(m.yMax),
        g.path && g.path.commands.length > 0 ? 1 : 0,
      ];
    }

    // Nonzero kerning over all cmap-glyph pairs (GPOS or kern, via the
    // same font.getKerningValue the reference's calcWordCharMetrics calls).
    const gidArr = [...gids];
    const kern = {};
    for (const gl of gidArr) {
      for (const gr of gidArr) {
        const v = ot.getKerningValue(gl, gr);
        if (v) kern[`${gl},${gr}`] = v;
      }
    }

    out.fonts[`${family}/${style}`] = {
      family,
      style,
      fontFaceName: fontI.fontFaceName,
      fontFaceStyle: fontI.fontFaceStyle,
      fontFaceWeight: fontI.fontFaceWeight,
      smallCapsMult: fontI.smallCapsMult,
      type: fontI.type,
      unitsPerEm: ot.unitsPerEm,
      ascender: ot.ascender,
      descender: ot.descender,
      os2: {
        fsSelection: os2.fsSelection ?? 0,
        sTypoAscender: os2.sTypoAscender ?? 0,
        sTypoDescender: os2.sTypoDescender ?? 0,
        usWinAscent: os2.usWinAscent ?? 0,
        usWinDescent: os2.usWinDescent ?? 0,
      },
      cmap: cmapObj,
      glyphs,
      kern,
    };
  }
}

process.stdout.write(JSON.stringify(out));
process.exit(0);
