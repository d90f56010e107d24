"""Built-in web chat UI — the analog of the reference's web chat app
(`mistralrs-cli/webui/`, Svelte SPA), served as a single static page at
``/`` that talks to the OpenAI-compatible API with streaming (SSE)
responses.

Feature parity with the reference app's core surfaces (no build step — one
self-contained document):

* **streaming chat** via ``/v1/chat/completions`` (``stream: true``)
* **message-branch editing**: any user message can be edited in place; the
  old continuation is kept as a branch and a ◀ n/m ▶ switcher flips
  between alternative continuations at that point
* **reasoning display**: ``<think>…</think>`` spans (and the
  ``reasoning_content`` field) render as a collapsible dim block above the
  answer
* **file browsing**: a sidebar lists ``/v1/files`` with click-to-view
  content
"""

INDEX_HTML = """<!doctype html>
<html lang="en">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>mistralrs-tpu chat</title>
<style>
  :root { --bg:#101418; --panel:#1a2027; --text:#e6e9ed; --dim:#8b949e;
          --accent:#4f8cc9; --user:#24303d; --asst:#1d242c; }
  * { box-sizing: border-box; }
  body { margin:0; background:var(--bg); color:var(--text);
         font:15px/1.5 system-ui, sans-serif; display:flex;
         flex-direction:column; height:100vh; }
  header { padding:10px 16px; background:var(--panel); display:flex;
           gap:12px; align-items:center; }
  header h1 { font-size:15px; margin:0; font-weight:600; }
  header select, header input[type=number] {
    background:var(--bg); color:var(--text); border:1px solid #333;
    border-radius:6px; padding:4px 8px; }
  header label { color:var(--dim); font-size:12px; }
  #main { flex:1; display:flex; min-height:0; }
  #log { flex:1; overflow-y:auto; padding:16px; }
  #files { width:0; overflow:hidden; transition:width .15s;
           background:var(--panel); border-left:1px solid #222; }
  #files.open { width:320px; overflow-y:auto; padding:10px; }
  .file-row { padding:6px 8px; border-radius:6px; cursor:pointer;
              font-size:13px; }
  .file-row:hover { background:var(--user); }
  #fileview { white-space:pre-wrap; font:12px/1.4 ui-monospace, monospace;
              background:var(--bg); border-radius:8px; padding:8px;
              margin-top:8px; max-height:50vh; overflow-y:auto; }
  .msg { max-width:46em; margin:0 auto 12px; padding:10px 14px;
         border-radius:10px; white-space:pre-wrap; position:relative; }
  .user { background:var(--user); }
  .assistant { background:var(--asst); }
  .role { font-size:11px; color:var(--dim); margin:0 auto 2px;
          max-width:46em; padding:0 4px; display:flex; gap:8px;
          align-items:center; }
  .role .spacer { flex:1; }
  .role button { background:none; border:0; color:var(--dim); padding:0 4px;
                 font-size:11px; cursor:pointer; }
  .role button:hover { color:var(--text); }
  details.think { max-width:46em; margin:0 auto 6px; color:var(--dim);
                  font-size:13px; }
  details.think pre { white-space:pre-wrap; margin:4px 0 0;
                      border-left:2px solid #333; padding-left:10px;
                      font:13px/1.4 inherit; }
  .edit-box { width:100%; background:var(--bg); color:var(--text);
              border:1px solid #444; border-radius:6px; padding:6px;
              font:inherit; }
  footer { padding:12px 16px; background:var(--panel); }
  form { display:flex; gap:8px; max-width:48em; margin:0 auto; }
  textarea { flex:1; resize:none; background:var(--bg); color:var(--text);
             border:1px solid #333; border-radius:8px; padding:8px 10px;
             font:inherit; height:3.2em; }
  button.primary { background:var(--accent); color:#fff; border:0;
           border-radius:8px; padding:0 18px; font:inherit; cursor:pointer; }
  button.primary:disabled { opacity:.5; cursor:default; }
  #stats { color:var(--dim); font-size:12px; margin-left:auto; }
</style>
</head>
<body>
<header>
  <h1>mistralrs-tpu</h1>
  <select id="model"></select>
  <label>temp <input id="temp" type="number" min="0" max="2" step="0.1"
                     value="0.7" style="width:4.5em"></label>
  <label>max <input id="maxtok" type="number" min="1" max="8192" value="512"
                    style="width:5em"></label>
  <button id="filesbtn" class="primary" type="button">Files</button>
  <span id="stats"></span>
</header>
<div id="main">
  <div id="log"></div>
  <aside id="files">
    <div style="font-size:13px;color:var(--dim)">/v1/files</div>
    <div id="filelist"></div>
    <div id="fileview" hidden></div>
  </aside>
</div>
<footer>
  <form id="f">
    <textarea id="q" placeholder="Send a message… (Enter to send, Shift+Enter for newline)"></textarea>
    <button id="send" class="primary" type="submit">Send</button>
  </form>
</footer>
<script>
const log = document.getElementById('log');
const form = document.getElementById('f');
const q = document.getElementById('q');
const send = document.getElementById('send');
const stats = document.getElementById('stats');

// conversation model: messages[i] = {role, content, reasoning}
// branches.get(i) = [suffix, ...] — alternative continuations from index i
// (message-branch editing, the reference webui's branch switcher)
let messages = [];
const branches = new Map();
let branchPos = new Map();   // i -> active branch index

fetch('/v1/models').then(r => r.json()).then(d => {
  const sel = document.getElementById('model');
  for (const m of d.data || []) sel.add(new Option(m.id, m.id));
});

// ---- files sidebar ---------------------------------------------------
const filesPanel = document.getElementById('files');
document.getElementById('filesbtn').addEventListener('click', async () => {
  filesPanel.classList.toggle('open');
  if (!filesPanel.classList.contains('open')) return;
  const list = document.getElementById('filelist');
  list.textContent = '';
  const d = await fetch('/v1/files').then(r => r.json()).catch(() => null);
  for (const f of (d && d.data) || []) {
    const row = document.createElement('div');
    row.className = 'file-row';
    row.textContent = (f.filename || f.id) + '  (' + (f.bytes ?? '?') + ' B)';
    row.addEventListener('click', async () => {
      const view = document.getElementById('fileview');
      view.hidden = false;
      view.textContent = await fetch('/v1/files/' + f.id + '/content')
        .then(r => r.text()).catch(e => 'error: ' + e);
    });
    list.append(row);
  }
  if (!list.childElementCount) list.textContent = '(no files)';
});

// ---- rendering --------------------------------------------------------
function splitThink(text) {
  // pull <think>…</think> spans out of the accumulated stream
  let reasoning = '', content = '', rest = text;
  for (;;) {
    const a = rest.indexOf('<think>');
    if (a < 0) { content += rest; break; }
    content += rest.slice(0, a);
    const b = rest.indexOf('</think>', a);
    if (b < 0) { reasoning += rest.slice(a + 7); break; }
    reasoning += rest.slice(a + 7, b);
    rest = rest.slice(b + 8);
  }
  return [reasoning.trim(), content];
}

function render() {
  log.textContent = '';
  messages.forEach((m, i) => {
    const r = document.createElement('div');
    r.className = 'role';
    const name = document.createElement('span');
    name.textContent = m.role;
    r.append(name);
    const alts = branches.get(i);
    if (m.role === 'user' && alts && alts.length > 1) {
      const pos = branchPos.get(i) || 0;
      const prev = document.createElement('button');
      prev.textContent = '◀';
      prev.title = 'previous branch';
      prev.addEventListener('click', () => switchBranch(i, -1));
      const lab = document.createElement('span');
      lab.textContent = (pos + 1) + '/' + alts.length;
      const next = document.createElement('button');
      next.textContent = '▶';
      next.title = 'next branch';
      next.addEventListener('click', () => switchBranch(i, +1));
      r.append(prev, lab, next);
    }
    r.append(Object.assign(document.createElement('span'),
                           {className: 'spacer'}));
    if (m.role === 'user') {
      const edit = document.createElement('button');
      edit.textContent = '✎ edit';
      edit.addEventListener('click', () => editMessage(i));
      r.append(edit);
    }
    log.append(r);
    if (m.reasoning) {
      const d = document.createElement('details');
      d.className = 'think';
      const s = document.createElement('summary');
      s.textContent = 'reasoning';
      const pre = document.createElement('pre');
      pre.textContent = m.reasoning;
      d.append(s, pre);
      log.append(d);
    }
    const div = document.createElement('div');
    div.className = 'msg ' + m.role;
    div.textContent = m.content;
    div.dataset.index = i;
    log.append(div);
  });
  log.scrollTop = log.scrollHeight;
}

// ---- branches ---------------------------------------------------------
function saveBranch(i) {
  const alts = branches.get(i) || [];
  alts[branchPos.get(i) || 0] = messages.slice(i).map(m => ({...m}));
  branches.set(i, alts);
}

function switchBranch(i, dir) {
  saveBranch(i);
  const alts = branches.get(i);
  const pos = ((branchPos.get(i) || 0) + dir + alts.length) % alts.length;
  branchPos.set(i, pos);
  messages = messages.slice(0, i).concat(alts[pos].map(m => ({...m})));
  render();
}

function editMessage(i) {
  const div = log.querySelector('.msg[data-index="' + i + '"]');
  if (!div) return;
  const box = document.createElement('textarea');
  box.className = 'edit-box';
  box.value = messages[i].content;
  div.textContent = '';
  div.append(box);
  box.focus();
  box.addEventListener('keydown', ev => {
    if (ev.key === 'Enter' && !ev.shiftKey) {
      ev.preventDefault();
      // snapshot the current continuation as a branch, start a new one
      saveBranch(i);
      const alts = branches.get(i);
      branchPos.set(i, alts.length);
      alts.push([]);
      messages = messages.slice(0, i);
      messages.push({role: 'user', content: box.value.trim()});
      render();
      complete();
    } else if (ev.key === 'Escape') { render(); }
  });
}

q.addEventListener('keydown', e => {
  if (e.key === 'Enter' && !e.shiftKey) { e.preventDefault(); form.requestSubmit(); }
});

form.addEventListener('submit', e => {
  e.preventDefault();
  const text = q.value.trim();
  if (!text) return;
  q.value = '';
  messages.push({role: 'user', content: text});
  render();
  complete();
});

// ---- streaming completion --------------------------------------------
async function complete() {
  send.disabled = true;
  const asst = {role: 'assistant', content: '', reasoning: ''};
  messages.push(asst);
  render();
  const t0 = performance.now();
  let ntok = 0, acc = '';
  try {
    const resp = await fetch('/v1/chat/completions', {
      method: 'POST', headers: {'Content-Type': 'application/json'},
      body: JSON.stringify({
        model: document.getElementById('model').value || 'default',
        messages: messages.slice(0, -1).map(
          m => ({role: m.role, content: m.content})),
        temperature: parseFloat(document.getElementById('temp').value),
        max_tokens: parseInt(document.getElementById('maxtok').value),
        stream: true,
      }),
    });
    if (!resp.ok) { asst.content = 'error: ' + await resp.text(); render(); return; }
    const reader = resp.body.getReader();
    const dec = new TextDecoder();
    let buf = '';
    for (;;) {
      const {done, value} = await reader.read();
      if (done) break;
      buf += dec.decode(value, {stream: true});
      let idx;
      while ((idx = buf.indexOf('\\n\\n')) >= 0) {
        const chunk = buf.slice(0, idx); buf = buf.slice(idx + 2);
        for (const line of chunk.split('\\n')) {
          if (!line.startsWith('data:')) continue;
          const data = line.slice(5).trim();
          if (data === '[DONE]') continue;
          const delta = JSON.parse(data).choices?.[0]?.delta || {};
          if (delta.reasoning_content) asst.reasoning += delta.reasoning_content;
          if (delta.content) { acc += delta.content; ntok++; }
        }
      }
      const [think, content] = splitThink(acc);
      asst.reasoning = asst.reasoning || think;
      if (think) asst.reasoning = think;
      asst.content = content;
      render();
      const dt = (performance.now() - t0) / 1000;
      stats.textContent = ntok + ' chunks · ' + (ntok / dt).toFixed(1) + '/s';
    }
  } catch (err) {
    asst.content = 'error: ' + err;
    render();
  } finally {
    send.disabled = false; q.focus();
  }
}
</script>
</body>
</html>
"""
