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
const doc = await scribe.openDocument(files);
const out = await doc.exportData(fmt);
process.stdout.write(typeof out === 'string' ? out : Buffer.from(out).toString('latin1'));
process.exit(0);
