// Drives the graft admin console's actual JS (extracted from GET /)
// against the live facade, with a minimal DOM stub. Asserts: schema loads
// table names, an SQL query renders rows, a PQL query renders, metrics and
// history populate, and the error path surfaces a server error.
const BASE = process.env.GRAFT_BASE || 'http://127.0.0.1:10101';

function el(id) {
  return {
    id, _text: '', value: '', style: {}, children: [],
    // real DOM: assigning textContent removes all children
    set textContent(v) { this._text = v; if (v === '') this.children = []; },
    get textContent() {
      return this._text + this.children.map(c => c.textContent).join('');
    },
    classList: { remove() {}, add() {} },
    appendChild(c) { this.children.push(c); },
    addEventListener() {},
    set onclick(f) { this._onclick = f; }, get onclick() { return this._onclick; },
    set onchange(f) { this._onchange = f; }, get onchange() { return this._onchange; },
  };
}
const els = {};
const byId = id => (els[id] ||= el(id));
global.document = {
  getElementById: byId,
  createElement: tag => Object.assign(el(''), { tag }),
};
// a token in the store exercises the gf() Authorization-header path on
// every request (the unauthenticated facade ignores the header; an authed
// one requires it — set GRAFT_TOKEN accordingly)
global.localStorage = {
  _t: process.env.GRAFT_TOKEN || 'console-drive-dummy-token',
  getItem(k) { return k === 'graft-token' ? this._t : null; },
  setItem(k, v) { if (k === 'graft-token') this._t = v; },
};
const realFetch = global.fetch;
let sawAuthHeader = false;
global.fetch = (url, opts) => {
  if (opts && opts.headers && /^Bearer .+/.test(opts.headers.Authorization || ''))
    sawAuthHeader = true;
  return realFetch(BASE + url, opts);
};
global.setInterval = () => 0; // don't keep the process alive

async function main() {
  const page = await (await realFetch(BASE + '/', {
    headers: { 'User-Agent': 'Mozilla/5.0' } })).text();
  const m = page.match(/<script>([\s\S]*)<\/script>/);
  if (!m) throw new Error('no <script> in page');
  // expose the console's top-level functions to the harness
  const src = m[1] + '\n;global.__fns = { loadSchema, run, loadOps, renderResult };';
  new Function(src)(); // executes like a classic <script> (sloppy mode)
  const { loadSchema, run, loadOps } = global.__fns;

  await loadSchema();
  const tables = byId('tables');
  const names = tables.children.filter(c => c.className === 'tbl')
    .map(c => c.textContent);
  if (!names.includes('region') || !names.includes('lineitem'))
    throw new Error('schema did not render tables: ' + JSON.stringify(names));
  // click a table: fields panel toggles
  const regionIdx = tables.children.findIndex(c => c.textContent === 'region');
  const fieldsDiv = tables.children[regionIdx + 1];
  tables.children[regionIdx].onclick();
  if (fieldsDiv.style.display !== 'block')
    throw new Error('table click did not expand fields');
  if (!/r_name : mutex/.test(fieldsDiv.textContent))
    throw new Error('fields text wrong: ' + fieldsDiv.textContent);
  if (/\\n/.test(fieldsDiv.textContent))
    throw new Error('literal backslash-n in fields text');

  // SQL query renders header + rows
  byId('q').value = 'SELECT _id, r_name FROM region';
  byId('mode').value = 'sql';
  await run();
  const res = byId('result');
  if (byId('error').textContent) throw new Error('sql error: ' + byId('error').textContent);
  const header = res.children[0].children.map(c => c.textContent);
  if (header.join(',') !== '_id,r_name')
    throw new Error('bad header: ' + header);
  if (res.children.length !== 6) // th + 5 rows
    throw new Error('expected 5 rows, got ' + (res.children.length - 1));
  if (byId('took').textContent !== '5 rows')
    throw new Error('took text: ' + byId('took').textContent);

  // PQL query via the index box
  byId('q').value = 'Count(Row(r_name="ASIA"))';
  byId('mode').value = 'pql';
  byId('pqlidx').value = 'region';
  await run();
  if (byId('error').textContent) throw new Error('pql error: ' + byId('error').textContent);
  const pqlCell = byId('result').children[0].children[0].textContent;
  if (!pqlCell.includes('"data":[[1]]'))
    throw new Error('pql result cell: ' + pqlCell);

  // error path: server error lands in #error, not the table
  byId('q').value = 'SELECT FROM nonsense syntax';
  byId('mode').value = 'sql';
  await run();
  if (!byId('error').textContent) throw new Error('error path silent');

  // ops panels populate
  await loadOps();
  if (byId('metrics').children.length < 3)
    throw new Error('metrics empty');
  if (byId('history').children.length < 1)
    throw new Error('history empty');
  const histRow = byId('history').children[0].children.map(c => c.textContent);
  if (!/ms$/.test(histRow[1])) throw new Error('history row: ' + histRow);
  // PQL/SQL queries ran above, so at least one row carries a span-tree
  // tooltip with nested (indented) sections
  const titled = byId('history').children.map(r => r.title || '')
    .filter(t => t.includes('request'));
  if (!titled.length) throw new Error('no span tooltip on history rows');
  if (!titled.some(t => /\n  \S/.test(t)))
    throw new Error('span tooltip not nested: ' + JSON.stringify(titled[0]));

  // active-queries panel: nothing in flight from this synchronous harness,
  // so it renders the idle row (cancel buttons are driven by
  // QueryGovernanceSpec against the endpoint itself)
  const active = byId('active');
  if (active.children.length < 1 || !/\(idle\)/.test(active.textContent))
    throw new Error('active panel: ' + active.textContent);

  if (!sawAuthHeader)
    throw new Error('gf() never attached the Authorization header');

  console.log('CONSOLE-DRIVE-OK tables=' + names.length +
    ' histRows=' + byId('history').children.length);
}
main().catch(e => { console.error('FAIL: ' + (e.stack || e)); process.exit(1); });
