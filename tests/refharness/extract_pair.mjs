// Paired-import parity harness: open MULTIPLE files through the actual
// reference (e.g. an image-only PDF supplying page metrics + a cloud-OCR
// JSON supplying the text layer) and print the export.
//   node extract_pair.mjs <fmt> <file1> <file2> [...]
import scribe from '/root/reference/scribe.js';
const fmt = process.argv[2] || 'text';
const files = process.argv.slice(3);
scribe.ScribeDoc.defaults.reflow = true;
scribe.ScribeDoc.defaults.usePDFText.ocr.main = true;
scribe.ScribeDoc.defaults.displayMode = 'ebook';
// Font optimization (paired image+hOCR imports) needs the canvas
// adapter this sandbox lacks; it tunes render metrics only — the
// exported text is unaffected.
scribe.ScribeDoc.defaults.skipFontOpt = true;
scribe.opt.inProcess = true;
// The import path console.log()s page-count warnings; keep stdout
// reserved for the export bytes.
console.log = console.error;
// The positioned-HTML export measures every word against the raw font
// registry, which exportData does not load on its own.
if (fmt === 'html') {
  const { loadBuiltInFontsRaw } = await import('/root/reference/js/fontContainerMain.js');
  await loadBuiltInFontsRaw();
}
const doc = await scribe.openDocument(files);
const out = await doc.exportData(fmt);
const isString = typeof out === 'string';
const payload = isString ? out : Buffer.from(out).toString('latin1');
if (process.env.REF_OUT) {
  const fs = await import('fs');
  // strings carry real text (utf-8); only raw binary rides latin1
  fs.writeFileSync(process.env.REF_OUT, payload, isString ? 'utf8' : 'latin1');
  process.exit(0);
}
// write callback before exit: process.exit drops anything past the
// 64 KiB pipe buffer
process.stdout.write(payload, () => process.exit(0));
