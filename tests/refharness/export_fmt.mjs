import scribe from '/root/reference/scribe.js';
import { loadBuiltInFontsRaw } from '/root/reference/js/fontContainerMain.js';
const inputFile = process.argv[2];
const fmt = process.argv[3] || 'text';
scribe.ScribeDoc.defaults.reflow = true;
scribe.ScribeDoc.defaults.usePDFText.ocr.main = true;
scribe.ScribeDoc.defaults.displayMode = 'ebook';
// Optional import-option overrides, e.g. DOCX_LINE_SPLIT_MODE=sentence
if (process.env.DOCX_LINE_SPLIT_MODE) {
  scribe.ScribeDoc.defaults.docxLineSplitMode = process.env.DOCX_LINE_SPLIT_MODE;
}
// txt/docx imports typeset with the raw font registry, which only
// propagates to the import workers when the scheduler exists — so those
// formats run in worker mode; everything else stays on the main thread.
const needsFonts = /\.(txt|docx)$/i.test(inputFile);
scribe.opt.inProcess = !needsFonts;
if (needsFonts) await scribe.init({ font: true });
const doc = await scribe.openDocument([inputFile]);
const out = await doc.exportData(fmt);
process.stdout.write(typeof out === 'string' ? out : Buffer.from(out).toString('latin1'));
process.exit(0);
